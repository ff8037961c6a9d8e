"""Perceptual hashing (operators/phash.py) vs plain-Python models."""

from __future__ import annotations

import hashlib
import itertools
import random

import numpy as np
import pyspark.sql.functions as F
import pytest

from lakeflush_spark.operators.phash import (
    GROUP_SIZE,
    NOISE_LEVELS,
    PHASH_BITS,
    PHASH_N,
    dct_coeffs,
    gray16_pattern,
    phash_chunks,
    phash_core_numpy,
    phash_from_gray,
    phash_images,
    phash_near_dups,
    phash_pooled_numpy,
)


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)


def _py_gray(doc_id: int) -> list[int]:
    """Plain-Python model of gray16_pattern."""
    g = doc_id // GROUP_SIZE
    a = 1 + _md5int(f"a:{g}") % 14
    b = 1 + _md5int(f"b:{g}") % 14
    f = 1 + _md5int(f"f:{g}") % 3
    inv = _md5int(f"i:{g}") % 2
    out = []
    for p in range(PHASH_N * PHASH_N):
        r, c = p >> 4, p & 15
        base = max(0, 230 - f * ((r - a) ** 2 + (c - b) ** 2))
        if inv:
            base = 230 - base
        out.append(base + _md5int(f"{doc_id}:{p}") % NOISE_LEVELS)
    return out


def _py_phash(gray: list[int]) -> int:
    """Plain-Python model of the integer DCT + packing (no numpy)."""
    C = dct_coeffs()
    t = [
        [sum(C[u][r] * gray[r * 16 + c] for r in range(16)) for c in range(16)]
        for u in range(8)
    ]
    d = [
        [sum(t[u][c] * C[v][c] for c in range(16)) for v in range(8)]
        for u in range(8)
    ]
    ac = [d[j // 8][j % 8] for j in range(1, 64)]
    s = sum(ac)
    return sum(1 << i for i, v in enumerate(ac) if v * PHASH_BITS > s)


def test_jvm_expression_matches_python_model(spark):
    random.seed(11)
    mats = [[random.randint(0, 255) for _ in range(256)] for _ in range(6)]
    df = spark.createDataFrame(
        [(i, m) for i, m in enumerate(mats)], "id long, gray array<bigint>"
    )
    got = {
        r.id: r.ph
        for r in df.select("id", phash_from_gray(F.col("gray")).alias("ph")).collect()
    }
    for i, m in enumerate(mats):
        want = _py_phash(m)
        assert got[i] == want
        assert phash_pooled_numpy(np.array(m).reshape(16, 16)) == want


def test_gray16_pattern_matches_python_model(spark):
    ids = list(range(9))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: list(r.g)
        for r in df.select("doc_id", gray16_pattern("doc_id").alias("g")).collect()
    }
    assert got == {i: _py_gray(i) for i in ids}


def test_phash_core_pooling_and_brightness_robustness():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 200, size=(64, 48), dtype=np.uint8)
    h1 = phash_core_numpy(img)
    # brightness shift: mean-thresholded low frequencies barely move
    h2 = phash_core_numpy(np.clip(img.astype(np.int64) + 30, 0, 255))
    assert bin(h1 ^ h2).count("1") <= 6
    # mild noise: still near
    noisy = np.clip(
        img.astype(np.int64) + rng.integers(-6, 7, size=img.shape), 0, 255
    )
    assert bin(h1 ^ phash_core_numpy(noisy)).count("1") <= 8
    # a different image is far
    other = rng.integers(0, 255, size=(64, 48), dtype=np.uint8)
    assert bin(h1 ^ phash_core_numpy(other)).count("1") > 12
    # a 16x16 image is hashed as-is (pooling is identity)
    small = rng.integers(0, 255, size=(16, 16), dtype=np.uint8)
    assert phash_core_numpy(small) == phash_pooled_numpy(small.astype(np.int64))
    # RGB goes through integer luma
    rgb = np.stack([img, img, img], axis=2)
    assert phash_core_numpy(rgb) == phash_core_numpy(img)


def test_phash_images_png_roundtrip(spark):
    from lakeflush_spark.operators.png_codec import encode_png

    rng = np.random.default_rng(5)
    # a smooth blob, its noisy copy, and an unrelated image
    yy, xx = np.mgrid[0:32, 0:32]
    blob = np.clip(230 - 2 * ((yy - 10) ** 2 + (xx - 20) ** 2), 0, 255).astype(
        np.uint8
    )
    noisy = np.clip(
        blob.astype(np.int64) + rng.integers(-5, 6, size=blob.shape), 0, 255
    ).astype(np.uint8)
    other = rng.integers(0, 255, size=(32, 32), dtype=np.uint8)
    rows = [
        (0, bytearray(encode_png(blob))),
        (1, bytearray(encode_png(noisy))),
        (2, bytearray(encode_png(other))),
        (3, bytearray(b"not a png")),  # corrupt: skipped, not fatal
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r.phash for r in phash_images(df).collect()}
    assert set(got) == {0, 1, 2}  # corrupt row dropped
    assert got[0] == phash_core_numpy(blob)
    assert bin(got[0] ^ got[1]).count("1") <= 7
    assert bin(got[0] ^ got[2]).count("1") > 12


def test_phash_chunks_partition_all_bits():
    import pyspark.sql as _  # noqa: F401

    cols = phash_chunks("h", max_hamming=7)
    assert len(cols) == 8
    # reconstruct: chunk widths cover exactly PHASH_BITS bits
    n = 8
    bounds = [PHASH_BITS * i // n for i in range(n + 1)]
    assert bounds[0] == 0 and bounds[-1] == PHASH_BITS
    assert all(b2 > b1 for b1, b2 in zip(bounds, bounds[1:]))


def test_phash_near_dups_matches_brute_force(spark):
    rng = random.Random(17)
    # seeds + near copies (flip <=7 bits) + unrelated hashes
    seeds = [rng.getrandbits(PHASH_BITS) for _ in range(8)]
    rows, next_id = [], 0
    for s in seeds:
        rows.append((next_id, s))
        next_id += 1
        flip = 0
        for b in rng.sample(range(PHASH_BITS), rng.randint(1, 7)):
            flip |= 1 << b
        rows.append((next_id, s ^ flip))
        next_id += 1
    for _ in range(30):
        rows.append((next_id, rng.getrandbits(PHASH_BITS)))
        next_id += 1
    df = spark.createDataFrame(rows, "media_id long, phash long")
    got = {
        (r.id1, r.id2, r.hamming) for r in phash_near_dups(df).collect()
    }
    want = {
        (a, b, bin(x ^ y).count("1"))
        for (a, x), (b, y) in itertools.combinations(rows, 2)
        if bin(x ^ y).count("1") <= 7
    }
    assert got == want


def test_phash_near_dups_validates_radius(spark):
    df = spark.createDataFrame([(0, 1)], "media_id long, phash long")
    with pytest.raises(ValueError, match="max_hamming"):
        phash_near_dups(df, max_hamming=PHASH_BITS)


def test_dedup_images_keeps_one_per_cluster(spark):
    from lakeflush_spark.operators.phash import dedup_images
    from lakeflush_spark.operators.png_codec import encode_png

    rng = np.random.default_rng(9)
    yy, xx = np.mgrid[0:32, 0:32]
    blob = np.clip(230 - 2 * ((yy - 12) ** 2 + (xx - 8) ** 2), 0, 255).astype(
        np.uint8
    )
    noisy = np.clip(
        blob.astype(np.int64) + rng.integers(-5, 6, size=blob.shape), 0, 255
    ).astype(np.uint8)
    other = rng.integers(0, 255, size=(32, 32), dtype=np.uint8)
    rows = [
        (0, bytearray(encode_png(blob)), "a"),
        (1, bytearray(encode_png(noisy)), "b"),   # near-dup of 0
        (2, bytearray(encode_png(other)), "c"),
        (3, bytearray(b"corrupt"), "d"),          # undecodable: kept
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary, tag string")
    kept = dedup_images(df).collect()
    ids = sorted(r.media_id for r in kept)
    assert ids == [0, 2, 3]
    # pass-through columns survive
    assert {r.tag for r in kept} == {"a", "c", "d"}


def _png_rows(ids_and_arrays):
    from lakeflush_spark.operators.png_codec import encode_png

    return [(i, bytearray(encode_png(a))) for i, a in ids_and_arrays]


def test_phash_dedup_stream_incremental(spark, tmp_path):
    """pHash dedup-on-arrival: within-batch near-dups collapse to the
    min id, cross-batch near-dups against ingested history drop, new
    images pass, and a checkpointed restart ingests nothing twice."""
    import glob
    import shutil

    from lakeflush_spark.streaming.phash import (
        StreamPhashConfig,
        phash_dedup_stream,
    )

    rng = np.random.default_rng(21)
    yy, xx = np.mgrid[0:32, 0:32]

    def blob(cy, cx, noise=0):
        img = np.clip(230 - 2 * ((yy - cy) ** 2 + (xx - cx) ** 2), 0, 255)
        if noise:
            img = np.clip(
                img + rng.integers(-noise, noise + 1, size=img.shape), 0, 255
            )
        return img.astype(np.uint8)

    src = tmp_path / "src"
    src.mkdir()
    cfg = StreamPhashConfig(
        source_dir=str(src),
        dest_dir=str(tmp_path / "dest"),
        hash_dir=str(tmp_path / "hashes"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )

    def add_file(name, rows):
        stage = tmp_path / f"_stage_{name}"
        spark.createDataFrame(
            rows, "media_id long, payload binary"
        ).coalesce(1).write.mode("overwrite").parquet(str(stage))
        shutil.copy(
            glob.glob(str(stage / "part-*.parquet"))[0], str(src / f"{name}.parquet")
        )

    # batch 1: ids 0/1 are noisy copies of one blob (1 drops), 2 distinct
    add_file(
        "b1",
        _png_rows([(0, blob(8, 8)), (1, blob(8, 8, noise=4)), (2, blob(24, 4))]),
    )
    phash_dedup_stream(spark, cfg).awaitTermination(180)
    assert sorted(
        r.media_id for r in spark.read.parquet(cfg.dest_dir).collect()
    ) == [0, 2]

    # batch 2: 10 re-encodes history's blob (drops), 11 is new,
    # 12 is undecodable (kept: skip-not-drop)
    add_file(
        "b2",
        _png_rows([(10, blob(8, 8, noise=3)), (11, blob(4, 26))])
        + [(12, bytearray(b"corrupt"))],
    )
    phash_dedup_stream(spark, cfg).awaitTermination(180)
    assert sorted(
        r.media_id for r in spark.read.parquet(cfg.dest_dir).collect()
    ) == [0, 2, 11, 12]

    # restart on the same checkpoint: no new input -> no change
    phash_dedup_stream(spark, cfg).awaitTermination(180)
    assert spark.read.parquet(cfg.dest_dir).count() == 4
    # store holds one hash per admitted DECODABLE image
    assert spark.read.parquet(cfg.hash_dir).count() == 3


def test_phash_images_skips_png_signed_corrupt_payloads(spark):
    """r12: corrupt-but-PNG-signed payloads (truncated IHDR ->
    struct.error; valid chunks but garbage zlib stream in IDAT ->
    zlib.error) must be SKIPPED like any other corrupt input, not
    crash the mapInPandas task."""
    from lakeflush_spark.operators.png_codec import encode_png

    good = np.arange(256, dtype=np.uint8).reshape(16, 16)
    png = bytes(encode_png(good))
    truncated_ihdr = png[:12]  # signature + chunk length, no IHDR body
    # corrupt the IDAT zlib stream in place: flip bytes after the IDAT
    # tag while keeping signature/IHDR intact (CRCs aren't checked, the
    # zlib inflate is what fails)
    idat = png.find(b"IDAT")
    assert idat > 0
    bad_idat = png[: idat + 4] + bytes(
        b ^ 0xFF for b in png[idat + 4 : idat + 12]
    ) + png[idat + 12 :]
    rows = [
        (0, bytearray(png)),
        (1, bytearray(truncated_ihdr)),
        (2, bytearray(bad_idat)),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id for r in phash_images(df).collect()}
    assert got == {0}


def _chain_triple():
    """Three images A,B,C with d(A,C)<=7, d(B,C)<=7 but d(A,B)>7 — a
    chain component where greedy drop-paired-ids and connected-
    components resolution disagree. C is a pixel-space midpoint of two
    offset blobs (parameters found by deterministic search; the
    asserts re-verify the chain shape so a phash change can't silently
    degrade the test)."""
    yy, xx = np.mgrid[0:32, 0:32]

    def blob(cy, cx):
        return np.clip(
            230 - 2 * ((yy - cy) ** 2 + (xx - cx) ** 2), 0, 255
        ).astype(np.uint8)

    a, b = blob(16, 20), blob(20, 20)
    c = np.clip(
        0.5 * a.astype(np.float64) + 0.5 * b.astype(np.float64), 0, 255
    ).astype(np.uint8)
    ha, hb, hc = phash_core_numpy(a), phash_core_numpy(b), phash_core_numpy(c)
    assert bin(ha ^ hc).count("1") <= 7
    assert bin(hb ^ hc).count("1") <= 7
    assert bin(ha ^ hb).count("1") > 7
    return a, b, c


def test_stream_within_batch_resolution_matches_dedup_images(spark, tmp_path):
    """r12: one batch containing the chain A-C, B-C (A,B not near)
    must keep ONLY the component minimum — exactly what dedup_images
    does on the same frame (the r11 greedy kept {A, B})."""
    import glob
    import shutil

    from lakeflush_spark.operators.phash import dedup_images
    from lakeflush_spark.streaming.phash import (
        StreamPhashConfig,
        phash_dedup_stream,
    )

    a, b, c = _chain_triple()
    rows = _png_rows([(0, a), (1, b), (2, c)])
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    batch_kept = sorted(r.media_id for r in dedup_images(df).collect())
    assert batch_kept == [0]

    src = tmp_path / "src"
    src.mkdir()
    stage = tmp_path / "_stage"
    df.coalesce(1).write.mode("overwrite").parquet(str(stage))
    shutil.copy(
        glob.glob(str(stage / "part-*.parquet"))[0], str(src / "b1.parquet")
    )
    cfg = StreamPhashConfig(
        source_dir=str(src),
        dest_dir=str(tmp_path / "dest"),
        hash_dir=str(tmp_path / "hashes"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    phash_dedup_stream(spark, cfg).awaitTermination(180)
    stream_kept = sorted(
        r.media_id for r in spark.read.parquet(cfg.dest_dir).collect()
    )
    assert stream_kept == batch_kept


def test_phash_stream_pair_flood_uses_distributed_cc(spark, tmp_path, monkeypatch):
    """r13 (ADVICE): a mutually-similar micro-batch produces O(batch²)
    pairs; above _PAIR_DRIVER_CAP the stream must resolve components
    with the distributed near_dup_clusters path — and keep EXACTLY the
    min-id survivor set the driver union-find keeps."""
    import glob
    import shutil

    import lakeflush_spark.streaming.phash as sphash
    from lakeflush_spark.streaming.phash import (
        StreamPhashConfig,
        phash_dedup_stream,
    )

    yy, xx = np.mgrid[0:32, 0:32]
    rng = np.random.default_rng(5)

    def blob(noise=0):
        img = np.clip(230 - 2 * ((yy - 10) ** 2 + (xx - 10) ** 2), 0, 255)
        if noise:
            img = np.clip(
                img + rng.integers(-noise, noise + 1, size=img.shape), 0, 255
            )
        return img.astype(np.uint8)

    # 6 noisy copies of ONE image (+1 distinct) -> up to 15 mutual
    # pairs; cap of 2 forces the distributed branch
    other = rng.integers(0, 255, size=(32, 32), dtype=np.uint8)
    rows = _png_rows(
        [(i, blob(noise=2)) for i in range(6)] + [(9, other)]
    )

    def run(tag, cap):
        monkeypatch.setattr(sphash, "_PAIR_DRIVER_CAP", cap)
        src = tmp_path / f"src_{tag}"
        src.mkdir()
        stage = tmp_path / f"_stage_{tag}"
        spark.createDataFrame(
            rows, "media_id long, payload binary"
        ).coalesce(1).write.mode("overwrite").parquet(str(stage))
        shutil.copy(
            glob.glob(str(stage / "part-*.parquet"))[0],
            str(src / "b1.parquet"),
        )
        cfg = StreamPhashConfig(
            source_dir=str(src),
            dest_dir=str(tmp_path / f"dest_{tag}"),
            hash_dir=str(tmp_path / f"hashes_{tag}"),
            checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
        )
        phash_dedup_stream(spark, cfg).awaitTermination(180)
        return sorted(
            r.media_id for r in spark.read.parquet(cfg.dest_dir).collect()
        )

    distributed = run("dist", cap=2)
    driver = run("drv", cap=100_000)
    assert distributed == driver == [0, 9]
