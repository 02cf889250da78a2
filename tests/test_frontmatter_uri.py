"""Front-matter + URI derivation tests, modeled on the reference's
hugo_test.py (TestFrontMatter, TestGetPages)."""

from docs_indexer_ray.functions.frontmatter import parse_front_matter
from docs_indexer_ray.functions.uri import url_to_uri_breadcrumb

# hugo_test.py:7-17 verbatim
DOC_WITH_YAML = """---
title: Node Pools
description: A general description of node pools as a concept, it's benefits, and some details you should be aware of.
date: 2019-12-19
weight: 130
type: page
categories: ["basics"]
---

This is the YAML example's text
"""

DOC_WITHOUT = """# Headline 1

The _Giant Swarm App Catalog_ refers to a set of features and concepts that allow
you to browse, install and manage the configurations of apps (such as prometheus)
from a single place; the Control Plane.
"""


def test_front_matter_yaml():
    data, text = parse_front_matter(DOC_WITH_YAML)
    assert data["title"] == "Node Pools"
    assert text == "This is the YAML example's text"
    assert data["categories"] == ["basics"]


def test_front_matter_none():
    data, text = parse_front_matter(DOC_WITHOUT)
    assert data is None
    assert text is None


def test_front_matter_description_fallback():
    # hugo.py:287-289: empty body falls back to the description
    src = "---\ntitle: T\ndescription: the description\n---\n\n"
    data, text = parse_front_matter(src)
    assert text == "the description"


def test_front_matter_malformed_yaml_degrades():
    src = "---\ntitle: [unclosed\n---\nbody text\n"
    assert parse_front_matter(src) == (None, None)


def test_front_matter_empty_yaml_keeps_body():
    src = "---\n---\nbody text here\n"
    data, text = parse_front_matter(src)
    assert data is None
    assert text == "body text here"


def test_front_matter_non_dict_yaml_degrades():
    src = "---\njust a string\n---\nbody\n"
    assert parse_front_matter(src) == (None, None)


# --- URI derivation (hugo_test.py:92-149 semantics, over urls) ---------


def test_uri_regular_page():
    uri, bc = url_to_uri_breadcrumb("https://docs.example.test/basics/nodepools/")
    assert uri == "/basics/nodepools/"
    assert bc == ["basics", "nodepools"]


def test_uri_index_md_collapses():
    uri, bc = url_to_uri_breadcrumb("https://h/basics/_index.md")
    assert uri == "/basics/"
    assert bc == ["basics"]
    uri, bc = url_to_uri_breadcrumb("https://h/index.md")
    assert uri == "/"
    assert bc == []


def test_uri_md_suffix_appended_as_segment():
    uri, bc = url_to_uri_breadcrumb("https://h/basics/nodepools.md")
    assert uri == "/basics/nodepools/"
    assert bc == ["basics", "nodepools"]


def test_uri_lowercased_breadcrumb_keeps_case():
    # hugo_test.py:130-138: uri lowercased, path keeps original case
    uri, bc = url_to_uri_breadcrumb("https://h/Advanced/MyPage/")
    assert uri == "/advanced/mypage/"
    assert bc == ["Advanced", "MyPage"]


def test_uri_query_fragment_dropped():
    uri, bc = url_to_uri_breadcrumb("https://h/a/b/?q=1#frag")
    assert uri == "/a/b/"
    assert bc == ["a", "b"]


def test_uri_bare_md_segment_dropped():
    """A trailing segment that is exactly '.md' strips to nothing and
    must be dropped, not kept as an empty breadcrumb element."""
    from docs_indexer_ray.functions.uri import url_to_uri_breadcrumb

    uri, crumbs = url_to_uri_breadcrumb("https://x.test/docs/.md")
    assert uri == "/docs/" and crumbs == ["docs"]
