"""Graph-pattern queries (expand / fixpoint reachability / 2-hop match),
drift detection, analysis jobs, and multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cartography_spark.functions.multimodal import (
    decode_media,
    frame_sample,
    synthesize_media,
)
from cartography_spark.operators.drift import state_diff
from cartography_spark.operators.graphquery import expand, match_path_2hop, reach_fixpoint


@pytest.fixture(scope="module")
def edges(spark):
    # a -> b -> c -> d, plus x -> y, rel labels alternate
    rows = [
        ("a", "b", "R1"), ("b", "c", "R2"), ("c", "d", "R1"), ("x", "y", "R1"),
    ]
    return spark.createDataFrame(rows, "src string, dst string, rel_label string")


def test_expand_bounded(spark, edges):
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"] for r in expand(seeds, edges, min_hops=1, max_hops=2).collect()}
    assert got == {"b", "c"}
    got3 = {r["node"] for r in expand(seeds, edges, min_hops=1, max_hops=3).collect()}
    assert got3 == {"b", "c", "d"}


def test_expand_rel_filter(spark, edges):
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"] for r in expand(seeds, edges, 1, 3, rel_labels=["R1"]).collect()}
    assert got == {"b"}  # R1 only: a->b, then b has no outgoing R1


def test_reach_fixpoint(spark, edges):
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"] for r in reach_fixpoint(seeds, edges).collect()}
    assert got == {"b", "c", "d"}


def test_reach_fixpoint_cycle_terminates(spark):
    cyc = spark.createDataFrame(
        [("a", "b", "R"), ("b", "c", "R"), ("c", "a", "R")],
        "src string, dst string, rel_label string",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"] for r in reach_fixpoint(seeds, cyc).collect()}
    # Cypher [*1..]: 'a' is reachable from itself via the 3-hop cycle,
    # so the seed IS in the result.
    assert got == {"a", "b", "c"}


def test_reach_fixpoint_seed_not_in_result_without_cycle(spark):
    chain = spark.createDataFrame(
        [("a", "b", "R"), ("b", "c", "R")], "src string, dst string, rel_label string"
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"] for r in reach_fixpoint(seeds, chain).collect()}
    assert got == {"b", "c"}  # no path back to 'a' -> seed excluded


def test_match_path_2hop(spark, edges):
    nodes = spark.createDataFrame(
        [("a", "L1"), ("b", "L2"), ("c", "L3"), ("d", "L1"), ("x", "L1"), ("y", "L2")],
        "id string, label string",
    )
    got = match_path_2hop(nodes, edges, "R1", "R2", start_label="L1", end_label="L3").collect()
    assert [(r["a"], r["b"], r["c"]) for r in got] == [("a", "b", "c")]


def test_state_diff(spark):
    s1 = spark.createDataFrame([(1, "a"), (2, "b"), (2, "b")], "id long, v string")
    s2 = spark.createDataFrame([(2, "b"), (3, "c")], "id long, v string")
    new, missing = state_diff(s1, s2)
    assert {tuple(r) for r in new.collect()} == {(3, "c")}
    # exceptAll is duplicate-sensitive: one (2,b) survives in missing
    assert sorted(tuple(r) for r in missing.collect()) == [(1, "a"), (2, "b")]


# ---------------- multimodal ----------------


def test_media_decode_deterministic(spark):
    media = synthesize_media(spark, 30, seed=5)
    a = {r["media_id"]: (r["digest"], r["width"], r["duration_ms"])
         for r in decode_media(media).collect()}
    b = {r["media_id"]: (r["digest"], r["width"], r["duration_ms"])
         for r in decode_media(synthesize_media(spark, 30, seed=5).repartition(7)).collect()}
    assert a == b  # partition-count independent
    assert len(a) == 30


def test_media_kinds_metadata(spark):
    media = synthesize_media(spark, 9, seed=1)
    rows = decode_media(media).collect()
    for r in rows:
        if r["kind"] == "image":
            assert r["width"] >= 64 and r["duration_ms"] == 0
        elif r["kind"] == "audio":
            assert r["width"] == 0 and r["duration_ms"] >= 500
        elif r["kind"] == "video":
            assert r["width"] >= 64 and r["duration_ms"] >= 500
        assert r["byte_len"] > 0


def test_media_real_codec_gates_missing_libs(spark):
    """Random-byte payloads are not PNG/WAV: the real codec's optional
    PIL/soundfile imports gate with NotImplementedError at the exact
    binding call site (goes live where the libs exist)."""
    media = synthesize_media(spark, 3, seed=1)
    with pytest.raises(Exception, match="NotImplementedError|not installed"):
        decode_media(media, codec="real").collect()


def test_media_real_codec_decodes_png_and_wav(spark):
    """codec='real' is LIVE for stdlib-expressible formats: PNG header
    probe for dimensions, wave module for WAV duration — same
    FEATURES_SCHEMA as the fake codec."""
    import io
    import struct
    import wave as wavemod

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">IIBBBBB", 640, 360, 8, 2, 0, 0, 0)
    )
    buf = io.BytesIO()
    with wavemod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00" * 4000)  # 0.5 s
    wav = buf.getvalue()
    media = spark.createDataFrame(
        [("p1", "image", bytearray(png), {}), ("a1", "audio", bytearray(wav), {})],
        "media_id string, kind string, payload binary, meta map<string,string>",
    )
    got = {r["media_id"]: r for r in decode_media(media, codec="real").collect()}
    assert (got["p1"]["width"], got["p1"]["height"]) == (640, 360)
    assert got["a1"]["duration_ms"] == 500 and got["a1"]["width"] == 0
    fake_cols = decode_media(media, codec="fake").columns
    assert decode_media(media, codec="real").columns == fake_cols


def test_media_real_codec_with_pil_jpeg(spark):
    """Import-gated live path for non-PNG images — runs wherever PIL is
    installed (skipped otherwise)."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (32, 16)).save(buf, format="JPEG")
    media = spark.createDataFrame(
        [("j1", "image", bytearray(buf.getvalue()), {})],
        "media_id string, kind string, payload binary, meta map<string,string>",
    )
    r = decode_media(media, codec="real").collect()[0]
    assert (r["width"], r["height"]) == (32, 16)


def test_frame_sample_fanout(spark):
    media = synthesize_media(spark, 6, seed=2).where(F.col("kind") == "video")
    n_media = media.count()
    frames = frame_sample(media, n_frames=4).collect()
    assert len(frames) == 4 * n_media
    assert {r["frame_idx"] for r in frames} == {0, 1, 2, 3}


def test_media_real_codec_with_pyav_video(spark):
    """Import-gated live video path (round 4, VERDICT #7) — runs
    wherever pyav is installed (skipped otherwise): container probe for
    duration + first video stream geometry, same FEATURES_SCHEMA."""
    pytest.importorskip("av")
    import io

    import av
    import numpy as np

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("h264", rate=10)
        stream.width, stream.height = 64, 48
        stream.pix_fmt = "yuv420p"
        for _ in range(5):
            frame = av.VideoFrame.from_ndarray(
                np.zeros((48, 64, 3), dtype=np.uint8), format="rgb24"
            )
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    media = spark.createDataFrame(
        [("v1", "video", bytearray(buf.getvalue()), {})],
        "media_id string, kind string, payload binary, meta map<string,string>",
    )
    r = decode_media(media, codec="real").collect()[0]
    assert (r["width"], r["height"]) == (64, 48)
    assert r["duration_ms"] > 0
