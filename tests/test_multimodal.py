"""Multimodal plumbing: mapInPandas batch shapes, resize metadata,
frame sampling fan-out."""

from __future__ import annotations

from nyc_opendata_etl_spark.operators import multimodal as M


def _media(spark):
    docs = spark.createDataFrame(
        [(0, "abcdef" * 20), (1, "xy"), (2, "hello world " * 10), (3, "Z")],
        "doc_id long, text string",
    )
    return M.synthesize_media(docs)


def test_synthesize_and_extract_features(spark):
    media = _media(spark)
    feats = {r["media_id"]: r for r in M.extract_features(media).collect()}
    assert feats[0]["n_bytes"] == 64          # 120 chars truncated to 64
    assert feats[1]["n_bytes"] == 2
    assert feats[0]["first_byte"] == ord("a")
    assert feats[1]["last_byte"] == ord("y")
    assert feats[3]["byte_sum_mod"] == ord("Z") % 997


def test_resize_images_only_touches_images(spark):
    media = _media(spark)
    out = M.resize_images(media, max_dim=50)
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {0, 1, 2, 3}
    for r in rows.values():
        if r["kind"] == "image":
            assert max(r["width"], r["height"]) <= 50
        else:
            orig = {m["media_id"]: m for m in media.collect()}[r["media_id"]]
            assert r["width"] == orig["width"] and bytes(r["payload"]) == bytes(
                orig["payload"]
            )


def test_sample_frames(spark):
    media = _media(spark)
    videos = {r["media_id"]: r for r in media.collect() if r["kind"] == "video"}
    out = M.sample_frames(media, every_n=5).collect()
    by_id: dict[int, list] = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert set(by_id) == set(videos)
    for mid, idxs in by_id.items():
        n = videos[mid]["n_frames"]
        assert idxs == list(range(0, n, 5))
