"""Real DCT perceptual hash, bilinear resize, and the composed
image-curation pipeline (functions/codecs.py + operators/images.py).

The curation pipeline is the image-axis sibling of d14's document
pipeline: the near-dup plants are PIXEL mutations (brightness shift +
re-encode), so only an operator that decodes and perceptually hashes the
pixels can pair them — the stored ingest `phash` column is useless here.
"""

import numpy as np
import pandas as pd

from gtfs_osm_sync_spark import synth
from gtfs_osm_sync_spark.functions.codecs import (
    bilinear_resize,
    dct_phash,
    dct_phash_batch,
    decode_image,
    decode_lossy,
    encode_lossy,
    luma,
    png_decode,
    resize_uint8,
)
from gtfs_osm_sync_spark.operators import images as IMG


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def _synth_img(i: int) -> np.ndarray:
    ph = int(synth.splitmix64(np.array([i], dtype=np.uint64))[0])
    h = 8 + int(synth.splitmix64(np.array([ph ^ 1], dtype=np.uint64))[0] % 25)
    w = 8 + int(synth.splitmix64(np.array([ph ^ 2], dtype=np.uint64))[0] % 25)
    return synth.pixels_for(ph, h, w)


# ---------------------------------------------------------------------------
# numpy layer
# ---------------------------------------------------------------------------


def test_bilinear_resize_identity_and_hand_case():
    img = _synth_img(7)
    # same-size resize is exact identity (half-pixel centers land on pixels)
    assert np.array_equal(resize_uint8(img, *img.shape[:2]), img)
    # hand case: 1-D ramp 2x2 -> 4x4, half-pixel-center convention.
    # src = (dst + 0.5) * 0.5 - 0.5 = [-0.25, 0.25, 0.75, 1.25] -> clipped
    # [0, 0.25, 0.75, 1] -> weights [0, .25, .75, 1] between the two rows.
    a = np.array([[0.0, 10.0], [100.0, 110.0]])
    out = bilinear_resize(a, 4, 4)
    exp_col0 = np.array([0.0, 25.0, 75.0, 100.0])
    assert np.allclose(out[:, 0], exp_col0)
    assert np.allclose(out[0, :], np.array([0.0, 2.5, 7.5, 10.0]))
    # interior point mixes both axes
    assert np.allclose(out[1, 1], (0.75 * 0.75) * 0 + (0.75 * 0.25) * 10
                       + (0.25 * 0.75) * 100 + (0.25 * 0.25) * 110)


def test_dct_phash_separation():
    """Plants land within Hamming 2; unrelated images sit far away."""
    shift, lossy, rand = [], [], []
    prev = None
    for i in range(120):
        img = _synth_img(i)
        p0 = dct_phash(img)
        p_shift = dct_phash(np.clip(img.astype(np.int16) + 4, 0, 255).astype(np.uint8))
        p_lossy = dct_phash(decode_lossy(encode_lossy(img)))
        shift.append(_ham(p0, p_shift))
        lossy.append(_ham(p0, p_lossy))
        if prev is not None:
            rand.append(_ham(p0, prev))
        prev = p0
    assert max(shift) <= 3, max(shift)
    assert max(lossy) <= 3, max(lossy)
    assert min(rand) >= 10, min(rand)


def test_dct_phash_batch_matches_single():
    grays = np.stack(
        [bilinear_resize(luma(_synth_img(i)), 32, 32) for i in range(16)]
    )
    batch = dct_phash_batch(grays)
    singles = [dct_phash(_synth_img(i)) for i in range(16)]
    assert list(batch) == singles


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


def test_resize_images_operator(spark):
    images = synth.generate_images(spark, 60, partitions=3)
    thumbs = IMG.resize_images(images, 16, 16).toPandas().set_index("image_id")
    orig = images.toPandas().set_index("image_id")
    assert len(thumbs) == 60
    for iid in list(orig.index)[:20]:
        src = decode_image(orig.loc[iid, "bytes"], orig.loc[iid, "fmt"])
        got = png_decode(thumbs.loc[iid, "bytes"])
        assert got.shape == (16, 16, 3)
        assert np.array_equal(got, resize_uint8(src, 16, 16))


def test_image_features_matches_numpy(spark):
    images = synth.generate_images(spark, 80, partitions=4)
    feats = IMG.image_features(images).toPandas().set_index("image_id")
    orig = images.toPandas().set_index("image_id")
    assert len(feats) == 80
    for iid in list(orig.index)[:25]:
        img = decode_image(orig.loc[iid, "bytes"], orig.loc[iid, "fmt"])
        g = luma(img)
        row = feats.loc[iid]
        assert row["h"] == img.shape[0] and row["w"] == img.shape[1]
        assert row["brightness"] == round(float(g.mean()), 6)
        assert row["contrast"] == round(float(g.std()), 6)
        assert int(row["phash64"]) == dct_phash(img)


def _expected_curation(images_pdf: pd.DataFrame, bright_lo=112.0, bright_hi=143.0):
    """Driver-side re-implementation of the gate + plant pairing."""
    rows = {}
    for _, r in images_pdf.iterrows():
        img = decode_image(r["bytes"], r["fmt"])
        g = luma(img)
        rows[r["image_id"]] = dict(
            bright=round(float(g.mean()), 6),
            phash=dct_phash(img),
        )
    ok = {
        iid: v for iid, v in rows.items() if bright_lo <= v["bright"] <= bright_hi
    }
    pairs = set()
    for iid in ok:
        if iid.startswith("dup"):
            other = "img" + iid[3:]
            if other in ok and _ham(ok[iid]["phash"], ok[other]["phash"]) <= 3:
                pairs.add((iid, other))
    return ok, pairs


def test_curate_images_semantics(spark):
    n = 400
    images = synth.generate_images_with_dups(spark, n)
    pdf = images.toPandas()
    assert len(pdf) == n + n // 10
    ok, pairs = _expected_curation(pdf)
    cur = IMG.curate_images(images).toPandas()
    # survivors: gate-passers minus one side of each planted pair
    assert len(cur) == len(ok) - len(pairs)
    # canonical side is the lexical min ('dupX' < 'imgX')
    surv = set(cur["image_id"])
    for dup_id, img_id in pairs:
        assert dup_id in surv and img_id not in surv
    # n_dups counts the dropped members behind each canonical row
    by_id = cur.set_index("image_id")["n_dups"]
    for dup_id, _ in pairs:
        assert by_id[dup_id] == 1
    assert (cur[~cur["image_id"].isin({d for d, _ in pairs})]["n_dups"] == 0).all()
    # shard assignment is total and bounded
    assert cur["shard"].between(0, 15).all()
    # no unrelated merges: every dropped id is the img-side of a plant
    dropped = set(ok) - surv
    assert dropped == {img_id for _, img_id in pairs}


def test_curation_plan_shape(spark):
    """The 100x plan: the gated feature frame (the decode pass) is
    persisted and cache-reused by both consumers — the final plan reads
    InMemoryTableScan, not a second decode — and no stage degenerates to
    a nested-loop/cartesian surface."""
    images = synth.generate_images_with_dups(spark, 200)
    cur = IMG.curate_images(images)
    cur.collect()  # populate the internal persist so the plan binds to it
    plan = cur._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_curation_deterministic_across_partitionings(spark):
    import pyspark.sql.functions as F

    def digest(parts):
        images = synth.generate_images_with_dups(spark, 300, partitions=parts)
        return (
            IMG.curate_images(images)
            .agg(
                F.count("*"),
                F.sum(F.substring("image_id", 4, 12).cast("long")),
                F.bit_xor("phash64"),
                F.sum("n_dups"),
            )
            .collect()[0]
        )

    assert digest(2) == digest(7)
