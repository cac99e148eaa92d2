"""Query-file source (S4): TREC topic files.

Replicates the reference's parse (Searcher.java:204-269): per
``<top>`` element, qid = text after ``Number:`` inside ``<num>``,
title = the ``<title>`` text, and the description is kept only when
it contains ``discuss`` — the fragment between ``discuss`` and the
first ``.`` — mirroring the reference's substring logic.  The parsed
pairs feed ``SearchEngine.search_batch`` as ``title@desc`` strings
(the same shape the UI's single-query box used).

Driver-side parse: topic files are tiny (S4 is a driver artifact in
the reference too); the scale path is the batch scorer, not the file
read.
"""

from __future__ import annotations

import re

_TOP_RE = re.compile(r"<top>(.*?)</top>", re.DOTALL | re.IGNORECASE)
_NUM_RE = re.compile(r"<num>\s*Number:\s*([^<\n]*)", re.IGNORECASE)
_TITLE_RE = re.compile(r"<title>\s*(.*?)\s*(?:</title>|<desc|$)", re.DOTALL | re.IGNORECASE)
_DESC_RE = re.compile(r"<desc>(.*?)(?:<narr>|</desc>|</top>|$)", re.DOTALL | re.IGNORECASE)


def parse_topics(text: str) -> list[tuple[str, str, str]]:
    """TREC topics -> sorted [(qid, title, desc)] (TreeMap order,
    Searcher.java:59-60)."""
    out = []
    for m in _TOP_RE.finditer(text):
        block = m.group(1)
        num = _NUM_RE.search(block)
        title = _TITLE_RE.search(block)
        if not num or not title:
            continue
        qid = num.group(1).strip()
        q = title.group(1).strip()
        desc = ""
        dm = _DESC_RE.search(block)
        if dm:
            d = dm.group(1).lower()
            if "description:" in d:
                d = d.split("description:", 1)[1]
            # reference keeps only the fragment after "discuss" up to
            # the first period; no "discuss" => empty (Searcher.java:233-237)
            if "discuss" in d and "." in d[d.index("discuss"):]:
                d = d[d.index("discuss") + 7:]
                desc = d[: d.index(".")].strip() if "." in d else d.strip()
        out.append((qid, q, desc))
    return sorted(out)


def read_topic_file(path: str) -> list[tuple[str, str]]:
    """-> [(qid, "title@desc")] ready for ``search_batch``."""
    with open(path, encoding="utf-8") as fh:
        topics = parse_topics(fh.read())
    return [(qid, f"{title}@{desc}" if desc else title) for qid, title, desc in topics]
