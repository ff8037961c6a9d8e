"""Property-based cross-checks of the r7 surfaces (SURVEY §5 model
strategy): the JPEG codec round trip over arbitrary images, the
semantic verify join against a brute-force model, and the magnitude
coding / bit-writer internals against plain-Python spec models.
"""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakeflush_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg

# ---- JPEG round trip over arbitrary small images --------------------------
# Lossy codec: the property is bounded reconstruction error + exact
# shape + determinism, not equality. Random noise is the WORST case
# for DCT coding, so the bound is loose but still catches structural
# bugs (wrong zigzag, wrong table, wrong predictor) which produce
# garbage, not small offsets.


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    color=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_roundtrip_property(w, h, color, seed):
    rng = np.random.default_rng(seed)
    # smooth-ish content (random low-res field upsampled) keeps the
    # error bound meaningful; pure noise saturates quantization error
    base = rng.integers(0, 256, size=(max(1, h // 4), max(1, w // 4)))
    plane = np.kron(base, np.ones((4, 4)))[:h, :w]
    if color:
        img = np.stack([plane, np.roll(plane, 1, 0), np.roll(plane, 1, 1)], 2)
    else:
        img = plane
    img = img.astype(np.uint8)
    data = encode_jpeg(img, quality=95)
    back = decode_jpeg(data)
    assert back.shape == img.shape
    assert np.abs(back.astype(int) - img.astype(int)).mean() < 16.0
    assert data == encode_jpeg(img.copy(), quality=95)  # deterministic


# ---- magnitude coding vs the T.81 F.1.2.1 model ---------------------------


@settings(max_examples=200, deadline=None)
@given(v=st.integers(min_value=-32767, max_value=32767))
def test_jpeg_magnitude_coding_property(v):
    from lakeflush_spark.operators.jpeg_codec import _extend, _mag

    s, bits = _mag(v)
    assert 0 <= bits < (1 << max(s, 1))
    # decode side must invert encode side exactly
    assert _extend(bits, s) == v
    # size is minimal: v fits in s magnitude bits, not s-1
    if v != 0:
        assert (1 << (s - 1)) <= abs(v) < (1 << s)
    else:
        assert s == 0


# ---- bit writer vs a string-of-bits model ---------------------------------


@settings(max_examples=100, deadline=None)
@given(
    chunks=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 16) - 1),
            st.integers(min_value=1, max_value=16),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_bitwriter_matches_bitstring_model(chunks):
    from lakeflush_spark.operators.jpeg_codec import _BitWriter

    w = _BitWriter()
    bitstr = ""
    for code, length in chunks:
        code &= (1 << length) - 1
        w.write(code, length)
        bitstr += format(code, f"0{length}b")
    out = w.flush()
    # model: pad with 1s to a byte boundary, then byte-stuff 0xFF
    if len(bitstr) % 8:
        bitstr += "1" * (8 - len(bitstr) % 8)
    model = bytearray()
    for i in range(0, len(bitstr), 8):
        b = int(bitstr[i : i + 8], 2)
        model.append(b)
        if b == 0xFF:
            model.append(0x00)
    assert out == bytes(model)


# ---- semantic verify join vs a brute-force model --------------------------
# sem_dropped_ids must drop exactly the batch vectors with (a) any
# history neighbor >= threshold in the same cell, or (b) any LOWER-id
# batchmate >= threshold in the same cell — the greedy min-id rule.


def _cos4(a, b):
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    return round(float(np.dot(a, b) / (na * nb)), 4)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n_new=st.integers(min_value=1, max_value=8),
    n_hist=st.integers(min_value=0, max_value=8),
)
def test_sem_dropped_ids_matches_model(spark, seed, n_new, n_hist):
    from lakeflush_spark.streaming.semdedup import sem_dropped_ids

    rng = np.random.default_rng(seed)
    dims, n_cells, thr = 6, 2, 0.9

    def mk(n, base_id):
        rows = []
        for i in range(n):
            # half the vectors cluster near one of two anchors so
            # near-dups actually occur; cell ids assigned mod n_cells
            anchor = rng.integers(0, 2)
            v = (np.ones(dims) if anchor else -np.ones(dims)) + rng.normal(
                0, 0.4, dims
            )
            rows.append((base_id + i, [float(x) for x in v],
                         float(np.linalg.norm(v)), int(anchor) % n_cells))
        return rows

    new_rows = mk(n_new, 100)
    hist_rows = mk(n_hist, 0)
    schema = "vid long, v array<double>, nrm double, cell_id long"
    new_df = spark.createDataFrame(new_rows, schema)
    hist_df = spark.createDataFrame(hist_rows, schema) if hist_rows else None

    got = {r.vid for r in sem_dropped_ids(new_df, hist_df, thr).collect()}

    want = set()
    for vid, v, _n, cell in new_rows:
        va = np.array(v)
        for hvid, hv, _hn, hcell in hist_rows:
            if hcell == cell and _cos4(va, np.array(hv)) >= thr:
                want.add(vid)
        for ovid, ov, _on, ocell in new_rows:
            if ocell == cell and ovid < vid and _cos4(va, np.array(ov)) >= thr:
                want.add(vid)
    assert got == want
