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


# ---------------------------------------------------------------------------
# OpenAPI / CRD properties text (reference S6/T7, hugo.py:357-375)
# ---------------------------------------------------------------------------


def test_collect_properties_text_reference_order():
    """The exact emission sequence hugo_test.py:168-186 pins: a node's
    description first, then each property name followed by its own
    subtree, in schema order."""
    from docs_indexer_ray.functions.openapi import collect_properties_text

    assert collect_properties_text({}) == []
    assert collect_properties_text({"description": "top"}) == ["top"]
    schema = {
        "description": "top",
        "properties": {
            "spec": {
                "description": "spec desc",
                "properties": {
                    "replicas": {"description": "number of replicas"},
                    "name": {},
                },
            },
            "status": {"description": "status desc"},
        },
    }
    assert collect_properties_text(schema) == [
        "top",
        "spec",
        "spec desc",
        "replicas",
        "number of replicas",
        "name",
        "status",
        "status desc",
    ]


def test_collect_properties_text_deep_and_junk():
    """Iterative walk: 50k-deep nesting must not blow the recursion
    limit, and non-dict nodes contribute nothing instead of raising."""
    from docs_indexer_ray.functions.openapi import collect_properties_text

    deep: dict = {"description": "leaf"}
    for i in range(50_000):
        deep = {"properties": {f"p{i}": deep}}
    out = collect_properties_text(deep)
    assert out[-1] == "leaf" and len(out) == 50_001
    assert collect_properties_text({"properties": {"a": "not-a-schema"}}) == ["a"]
    assert collect_properties_text("junk") == []  # type: ignore[arg-type]


def test_read_crd_and_openapi_stage(ray_session, tmp_path):
    """read_crd parses a YAML manifest; the Ray stage extracts joined
    properties text per row, degrading unparseable rows to ''. """
    import ray.data
    import pyarrow as pa

    from docs_indexer_ray.functions.openapi import (
        openapi_properties_text,
        read_crd,
    )

    crd_yaml = (
        "description: top\n"
        "properties:\n"
        "  spec:\n"
        "    description: spec desc\n"
    )
    p = tmp_path / "crd.yaml"
    p.write_text(crd_yaml)
    assert read_crd(str(p)) == {
        "description": "top",
        "properties": {"spec": {"description": "spec desc"}},
    }

    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3], pa.int64()),
                "schema": pa.array([crd_yaml, ": not : yaml :", None]),
            }
        )
    )
    out = openapi_properties_text(ds, schema_col="schema").to_pandas()
    out = out.sort_values("id")
    assert out["text"].tolist() == ["top spec spec desc", "", ""]
