"""Generator determinism: regenerating a tier is byte-identical."""

import numpy as np

from mklab_focused_crawler_ray.fixtures.generate import gen_images, gen_items, gen_web


def test_images_deterministic():
    a, da = gen_images(30, seed=42)
    b, db = gen_images(30, seed=42)
    assert a.equals(b) and da.equals(db)
    c, _ = gen_images(30, seed=43)
    assert not a.equals(c)


def test_images_schema_matches_input_hint():
    t, _ = gen_images(5, seed=1)
    import pyarrow as pa

    assert t.schema.names == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    assert t.schema.field("bytes").type == pa.binary()
    assert t.schema.field("w").type == pa.int32()
    assert t.schema.field("phash").type == pa.int64()


def test_web_deterministic_and_linked():
    w1 = gen_web(300, 100, 50, seed=42, n_hosts=10)
    w2 = gen_web(300, 100, 50, seed=42, n_hosts=10)
    for k in w1:
        assert w1[k].equals(w2[k]), k
    # every page url is in the universe; out_links point into the universe
    uni = set(w1["urls"]["url"].to_pylist())
    for u in w1["pages"]["url"].to_pylist():
        assert u in uni
    for links in w1["pages"]["out_links"].to_pylist()[:20]:
        for l in links:
            assert l in uni


def test_web_exercises_edge_cases():
    w = gen_web(2000, 500, 100, seed=42, n_hosts=20)
    urls = w["urls"]["url"].to_pylist()
    assert any(len(u) > 300 for u in urls), "need >300-char URLs for fetch skip"
    assert any("/private/" in u for u in urls), "need robots-disallowed URLs"
    assert any(w["urls"]["is_social"].to_pylist()), "need social-routed URLs"
    assert w["redirects"].num_rows > 0
    # html exercises both sides of the image filters
    import re

    html = b"".join(w["pages"]["html"].to_pylist()[:200]).decode()
    assert ".gif" in html
    assert re.search(r'<img src="[^"]*" alt="[^"]*">', html), "dimension-less img"


def test_items_event_ramp():
    t = gen_items(2000, seed=42)
    titles = t["title"].to_pylist()
    ts = t["ts"].cast("int64").to_numpy()  # timestamp[ms] → ms
    t0 = ts.min()
    win = (ts - t0) // 60_000
    has = np.array(["quakeevent" in x for x in titles])
    early = has[win <= 1].mean()
    late = has[win >= win.max() - 1].mean()
    assert late > early + 0.2, (early, late)
