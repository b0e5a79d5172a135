"""FROZEN html -> text extractor.

The BASELINE input_hint pins a per-row invariant: *byte-identical
extracted text per url*. This module is therefore a frozen pure
function of the html bytes — DO NOT change its behaviour; golden
SHA-256 digests are pinned in tests/test_text_extract.py. (Role analog:
the reference's deterministic patch -> cube-cell transform, whose
golden stats are pinned in ``tests/test_arcticdem.py:26-29``.)

Spec (v1, frozen):
1. decode html bytes as UTF-8 (errors="replace");
2. drop <script>/<style> elements including content (case-insensitive);
3. replace <br> and closing block tags (</p> </div> </li> </h1..6>
   </tr> </title>) with "\n";
4. strip all remaining tags;
5. decode the five XML entities + &nbsp; + numeric &#NNN;/&#xHH;;
6. collapse runs of spaces/tabs to one space, strip each line,
   collapse blank-line runs, strip leading/trailing whitespace.
"""

from __future__ import annotations

import re

_SCRIPT_RE = re.compile(rb"(?is)<(script|style)\b.*?</\1\s*>")
_BLOCK_CLOSE_RE = re.compile(rb"(?i)<br\s*/?>|</(?:p|div|li|h[1-6]|tr|title)\s*>")
_TAG_RE = re.compile(rb"(?s)<[^>]*>")
_NUM_ENT_RE = re.compile(r"&#(x[0-9a-fA-F]+|[0-9]+);")
_WS_RE = re.compile(r"[ \t\r\f\v]+")
_BLANKS_RE = re.compile(r"\n\s*\n+")

_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"', "&apos;": "'", "&nbsp;": " "}


def _decode_numeric(m: re.Match) -> str:
    body = m.group(1)
    try:
        cp = int(body[1:], 16) if body[0] in "xX" else int(body)
        return chr(cp) if 0 < cp < 0x110000 else ""
    except (ValueError, OverflowError):
        return ""


def extract_text(html: bytes) -> str:
    """Frozen pure function: html bytes -> extracted text (str)."""
    if html is None:
        return ""
    raw = _SCRIPT_RE.sub(b"", html)
    raw = _BLOCK_CLOSE_RE.sub(b"\n", raw)
    raw = _TAG_RE.sub(b"", raw)
    s = raw.decode("utf-8", errors="replace")
    for ent, ch in _ENTITIES.items():
        s = s.replace(ent, ch)
    s = _NUM_ENT_RE.sub(_decode_numeric, s)
    s = _WS_RE.sub(" ", s)
    s = "\n".join(line.strip() for line in s.split("\n"))
    s = _BLANKS_RE.sub("\n", s)
    return s.strip()


def extract_text_batch(htmls) -> list[str]:
    """Batch form used inside Arrow pandas UDFs."""
    return [extract_text(h) for h in htmls]
