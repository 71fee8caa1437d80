"""HTML -> text extraction (M15): the stateful actor-pool stage.

The graft's per-row invariant (BASELINE.json input_hint): extracted
text must be byte-identical per url to the corpus' reference ``text``
column. The extractor below IS the reference implementation — the
corpus generator (sources/synthetic.py) builds html and derives the
stored ``text`` column by calling ``extract_text``, and the Ray stage
must reproduce it bit-for-bit through the distributed path.

No lxml/selectolax exists in this environment, so extraction is a
deterministic regex pipeline (script/style removal, tag stripping,
entity unescape, whitespace collapse) — pinned here, versioned by the
module, mirroring the reference's OSM-XML->GeoJSON parser stage shape
(osm_fetch.py:203-305: stateful parser, flattening, per-feature text).
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd

_SCRIPT = re.compile(rb"<script\b[^>]*>.*?</script>", re.S | re.I)
_STYLE = re.compile(rb"<style\b[^>]*>.*?</style>", re.S | re.I)
_COMMENT = re.compile(rb"<!--.*?-->", re.S)
_TAG = re.compile(rb"<[^>]+>")
_WS = re.compile(r"\s+")

EXTRACTOR_VERSION = "regex-v1"


def extract_text(html_bytes: bytes) -> str:
    """The canonical extraction: bytes in, normalized text out."""
    b = _SCRIPT.sub(b" ", html_bytes)
    b = _STYLE.sub(b" ", b)
    b = _COMMENT.sub(b" ", b)
    b = _TAG.sub(b" ", b)
    s = b.decode("utf-8", errors="replace")
    s = _html.unescape(s)
    return _WS.sub(" ", s).strip()


class HtmlExtractor:
    """Actor-pool stage: ``map_batches(HtmlExtractor, concurrency=(1,N),
    batch_size=small)`` — wide binary rows, so batches stay small and
    the html column is dropped on output (SURVEY.md §7.4)."""

    def __init__(self):
        # regexes are module-level (compiled at import); the actor holds
        # them plus the version tag so a mixed-version pool is detectable
        self.version = EXTRACTOR_VERSION

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = [extract_text(h) for h in batch["html"]]
        out = batch.drop(columns=["html"]).copy()
        out["extracted_text"] = texts
        return out
