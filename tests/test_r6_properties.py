"""Property-based cross-checks of the r6 surfaces (SURVEY §5 model
strategy): the PNG codec against a plain-Python spec model, BPE merge
replay parity with string ids, and hot-bucket stats vs a dict model.
"""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakeflush_spark.operators.png_codec import decode_png, encode_png

# ---- PNG round trip over arbitrary small images ---------------------------


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    ch=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_property(w, h, ch, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    back = decode_png(encode_png(img))
    assert back.shape == img.shape
    assert np.array_equal(back, img)
    # determinism: same pixels -> same bytes (content-addressable)
    assert encode_png(img) == encode_png(img.copy())


# ---- hot_bucket_stats vs a dict model -------------------------------------

_band_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),   # band key
        st.integers(min_value=0, max_value=30),  # doc id
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=_band_rows, cap=st.integers(min_value=1, max_value=6))
def test_hot_bucket_stats_matches_model(spark, rows, cap):
    from collections import Counter

    from lakeflush_spark.operators.dedup import hot_bucket_stats

    df = spark.createDataFrame(rows, "bh long, doc long")
    got = hot_bucket_stats(df, ["bh"], cap).first()
    sizes = Counter(b for b, _ in rows)
    hot = {b: n for b, n in sizes.items() if n > cap}
    assert got.n_hot_buckets == len(hot)
    assert got.n_rows_in_hot == sum(hot.values())
    assert got.n_rows_over_cap == sum(n - cap for n in hot.values())
