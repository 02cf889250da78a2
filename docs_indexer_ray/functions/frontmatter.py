"""YAML front-matter parsing with the reference's exact semantics.

Re-creates ``get_front_matter`` (``/root/reference/hugo.py:264-293``):

* front matter is delimited by the first two ``(---)\\n`` fence matches
  anywhere in the document (the reference uses ``re.finditer``, not an
  at-start anchor — a mid-document ``---\\n`` pair counts);
* fewer than two fences → ``(None, None)``;
* a YAML parse error between the fences → ``(None, None)``;
* otherwise the remainder after the second fence is rendered
  markdown→text, and if that text strips to empty and the front matter
  has a ``description``, the description is used as the body fallback
  (``hugo.py:287-289``);
* the returned text is ``.strip()``-ed.

Divergences from the reference (documented, deliberate — the engine
must never crash a 10^12-row build on one bad row, SURVEY §4):

* empty front matter (``yaml.load → None``) with an *empty* body would
  make the reference raise ``TypeError`` inside ``'description' in
  data`` — the caller's blanket except turns that into ``(None, None)``
  (``hugo.py:315-318``); we return the same ``(None, None)`` directly;
* front matter that parses to a non-dict (e.g. a bare string) would
  make the reference's caller crash at ``data["type"] = ...``
  (``hugo.py:324``, uncaught); we treat it as unparseable front matter
  → ``(None, None)``-like degradation handled by the assembly stage.
"""

from __future__ import annotations

import re

import yaml

try:  # same C-loader preference as the reference (hugo.py:20-24)
    from yaml import CSafeLoader as _Loader
except ImportError:  # pragma: no cover
    from yaml import SafeLoader as _Loader

from .minimarkdown import markdown_to_text

__all__ = ["parse_front_matter"]

_FENCE_RE = re.compile(r"(---)\n")


def parse_front_matter(source_text: str) -> tuple[dict | None, str | None]:
    """Return ``(front_matter_dict, body_text)``; see module docstring."""
    fences = list(_FENCE_RE.finditer(source_text))
    if len(fences) < 2:
        return (None, None)

    fm_start = fences[0].start(1)
    fm_end = fences[1].start(1)
    try:
        data = yaml.load(source_text[fm_start + 3 : fm_end], Loader=_Loader)
    except Exception:
        return (None, None)

    text = markdown_to_text(source_text[fm_end + 3 :])

    if not isinstance(data, dict):
        if data is None and text.strip() != "":
            # reference: data=None survives to the caller, which
            # replaces it with {} and keeps the text (hugo.py:320-322)
            return (None, text.strip())
        # None + empty text, or non-dict YAML: reference crashes or
        # TypeErrors its way to (None, None); we degrade cleanly.
        return (None, None)

    if text.strip() == "" and "description" in data:
        text = str(data["description"])

    return (data, text.strip())
