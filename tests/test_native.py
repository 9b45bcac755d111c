"""Native host library: parser robustness (two-pass consistency), codecs.

Regression tests for the advisor finding on parse_float_table: the counting
pass and the fill pass must tokenize identically, otherwise rows containing
non-numeric tokens shift the row accounting between the passes and the fill
pass writes past (or short of) the allocated numpy buffer.
"""

import numpy as np
import pytest

from ipcgen_tpu.utils import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _parse(tmp_path, text):
    p = tmp_path / "table.txt"
    p.write_text(text)
    return native.parse_float_table(str(p))


def test_parse_clean_table(tmp_path):
    out = _parse(tmp_path, "1 2 3\n4 5 6\n7.5 -8 9e2\n")
    np.testing.assert_allclose(out, [[1, 2, 3], [4, 5, 6], [7.5, -8, 900.0]])


def test_parse_extra_token_row_does_not_overflow(tmp_path):
    # A row with one trailing non-numeric token has 7 whitespace tokens but 6
    # parsable floats; under the old two-pass mismatch it was excluded from
    # the allocated row count yet written during fill (heap overflow).
    rows = ["%d %d %d %d %d %d" % tuple(range(i, i + 6)) for i in range(50)]
    rows[10] = rows[10] + " junk_token"
    rows[20] = rows[20] + " trailing garbage here"
    out = _parse(tmp_path, "\n".join(rows) + "\n")
    assert out is not None
    # Row 10 still parses (6 floats); row 20 has 8 tokens -> 6 floats too.
    assert out.shape == (50, 6)
    np.testing.assert_allclose(out[10], np.arange(10, 16))


def test_parse_junk_only_and_comment_rows(tmp_path):
    out = _parse(
        tmp_path,
        "1 2 3\njunk only row\n# a comment\n4 5 6\nnan_like_but_not\n7 8 9\n",
    )
    np.testing.assert_allclose(out, [[1, 2, 3], [4, 5, 6], [7, 8, 9]])


def test_parse_ragged_rows_dropped_consistently(tmp_path):
    out = _parse(tmp_path, "1 2 3\n4 5\n6 7 8\n9\n10 11 12\n")
    np.testing.assert_allclose(out, [[1, 2, 3], [6, 7, 8], [10, 11, 12]])


def test_parse_matches_numpy_loadtxt(tmp_path):
    rng = np.random.default_rng(3)
    table = rng.normal(size=(500, 7))
    text = "\n".join(" ".join("%.17g" % v for v in row) for row in table)
    out = _parse(tmp_path, text + "\n")
    np.testing.assert_allclose(out, table, rtol=1e-12)


def test_morton_order_matches_locality(rng):
    pts = rng.uniform(0, 5, (4000, 3)).astype(np.float32)
    order = native.morton_order(pts, bits=10)
    assert sorted(order.tolist()) == list(range(4000))
    # Z-order locality: consecutive points in the order are near in space.
    d = np.linalg.norm(np.diff(pts[order], axis=0), axis=1)
    assert np.median(d) < np.median(
        np.linalg.norm(np.diff(pts, axis=0), axis=1)
    )


def test_encode_labeled_payload_roundtrip(rng):
    n = 257
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, (n, 3)).astype(np.uint8)
    sem = rng.integers(0, 30, n).astype(np.uint16)
    ins = rng.integers(0, 99, n).astype(np.uint16)
    payload = native.encode_labeled_payload(xyz, rgb, sem, ins)
    assert len(payload) == n * 19
    rec = np.frombuffer(
        payload,
        dtype=np.dtype(
            [("xyz", "<f4", 3), ("rgb", "u1", 3), ("sem", "<u2"), ("ins", "<u2")]
        ),
    )
    np.testing.assert_array_equal(rec["xyz"], xyz)
    np.testing.assert_array_equal(rec["rgb"], rgb)
    np.testing.assert_array_equal(rec["sem"], sem)
    np.testing.assert_array_equal(rec["ins"], ins)
