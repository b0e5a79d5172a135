"""Golden digests for the FROZEN html -> text extractor.

text/extract.py's docstring names this file as the home of the pinned
SHA-256 digests (CLAUDE.md invariant #1: byte-identical extracted text
per url). The original pin lives in
tests/test_geo_kernel.py::TestExtract::test_golden_bytes; this file
broadens the corpus so any behavioural drift in ANY spec clause
(script/style drop, block-tag newlines, entity decode, whitespace
collapse, bad UTF-8) trips a digest mismatch.

DO NOT update these digests to make a failing test pass — that would
change the frozen behaviour. A failure here means extract.py changed.
"""

from __future__ import annotations

import hashlib

from smart_geocubes_spark.text.extract import extract_text

# (html bytes, sha256 of extracted utf-8 text)
GOLDEN = [
    (
        b"<html><head><title>t</title><script>var x=1;</script></head>"
        b"<body><p>hello</p><p>world</p></body></html>",
        "5244d4e02352a4a82a22eb3c7eb9039190b56035ba0e1cfbe6a9af9fc92dfb21",
    ),
    (
        b"<div>a&amp;b &lt;c&gt; &quot;d&quot; &#39;e&#39; &nbsp;f"
        b" &#65;&#x42;</div>",
        "211c3f295b0a090edaa782c198591c5e381a349f397bff04c118a521374309d9",
    ),
    (
        b"<STYLE>p{color:red}</STYLE><P>upper   case\ttags</P><BR>line2",
        "3f98d0a5fb80e85f62eafba5be1682a44ae9045b957df85e3d5edf0cf443dfef",
    ),
    (
        b"<ul><li>one</li><li>two</li></ul><h2>head</h2>\n\n\n<div>tail</div>",
        "1ac1d9fbd53ed5ef25913a173c6d9a19f146ee3fa25073c30d769def83790c48",
    ),
    (
        b"no tags at all, just text \xff\xfe with bad utf8",
        "10ed73821cf1d4f921b4309a74068139fe3ead191781577d0b31ff26347134cf",
    ),
]


def test_golden_digests():
    got = [hashlib.sha256(extract_text(h).encode("utf-8")).hexdigest() for h, _ in GOLDEN]
    want = [d for _, d in GOLDEN]
    assert got == want, "FROZEN extractor behaviour changed — do not ship this"


def test_pure_function_repeatable():
    h = GOLDEN[0][0]
    assert extract_text(h) == extract_text(h)
