"""Fixture generator: determinism, shapes, invariants."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from crawler_spark import fixtures as FX
from crawler_spark import images as I
from crawler_spark.canon import url_hash


def test_seeds_shape_and_determinism(spark):
    s1 = FX.gen_seeds_df(spark, 20, 6).toPandas().sort_values("seed_id")
    s2 = FX.gen_seeds_df(spark, 20, 6).toPandas().sort_values("seed_id")
    pd.testing.assert_frame_equal(s1.reset_index(drop=True), s2.reset_index(drop=True))
    assert s1["url"].nunique() == 20
    assert set(s1["schema_name"]) == {"flat", "office"}


def test_web_pages_consistency(spark):
    seeds = FX.gen_seeds_df(spark, 10, 4)
    pages = FX.gen_web_pages_df(seeds, n_images=500).toPandas()
    # page 0 per seed + 1..last_page
    for url, grp in pages.groupby(pages["url"].str.replace(r"&page=\d+", "", regex=True)):
        lp = grp["last_page"].iloc[0]
        assert sorted(grp["page"]) == list(range(0, lp + 1))
    # url_hash column must equal xxhash64(canonical url) — engine joins on it
    for _, r in pages.head(25).iterrows():
        assert r["url_hash"] == url_hash(r["url"])
    assert (pages["listing_ids"].str.len() == FX.LISTINGS_PER_PAGE).all()
    assert pages["fail_attempts"].isin([0, 1, 2, 3, 4, 99]).all()


def test_web_images_invariants(spark):
    imgs = FX.gen_web_images_df(spark, 24, seed=42, parallelism=4).toPandas()
    assert len(imgs) == 24
    for _, r in imgs.iterrows():
        dec = I.decode_image(bytes(r["bytes"]), r["fmt"])
        assert dec.shape == (r["h"], r["w"], 3)
        ref = I.gen_pixels(42, int(r["image_id"].rsplit("-", 1)[1]), r["w"], r["h"])
        if r["fmt"] == "png":
            assert (dec == ref).all()
        else:
            assert I.psnr(dec, ref) >= 40.0
        assert I.phash64(dec) == r["phash"]


def test_robots_shape(spark):
    rb = FX.gen_robots_df(spark, 20).toPandas()
    assert len(rb) == 20
    assert (rb.loc[rb["host"] == "host0000.example", "disallow_prefix"] == "/list").all()
    assert set(rb["crawl_delay_ms"]) <= {0, 100, 500}
