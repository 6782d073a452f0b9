"""Structured streaming (memory sink over file source) + multimodal stubs."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from em_connected_components_spark.functions.multimodal import (
    decode_image,
    extract_image_features,
    frame_sample_plan,
)
from em_connected_components_spark.streaming.events import (
    running_degree_monitor,
    session_windows,
    streaming_edge_ingest,
    windowed_counts,
)

SF = "/root/testdata/sf0.001"


_STAGE_DIR = None


def _stream_events(spark):
    # the file stream source requires a directory — stage a copy once
    global _STAGE_DIR
    if _STAGE_DIR is None:
        import shutil

        _STAGE_DIR = tempfile.mkdtemp(prefix="events_stream_")
        shutil.copy(f"{SF}/events.parquet", _STAGE_DIR)
    schema = spark.read.parquet(f"{SF}/events.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(_STAGE_DIR)
    )


@pytest.fixture()
def batch_events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_windowed_counts_stream_matches_batch(spark, batch_events):
    q = (
        windowed_counts(_stream_events(spark))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT win_start, event_type, n_events FROM win_out"
        ).collect()
    finally:
        q.stop()
    want = (
        batch_events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_session_windows_stream(spark):
    q = (
        session_windows(_stream_events(spark), gap="30 minutes")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sess_out").collect()
    finally:
        q.stop()
    assert len(rows) > 0
    assert all(r["sess_start"] <= r["sess_end"] for r in rows)


def test_streaming_edge_ingest_foreachbatch(spark, batch_events):
    with tempfile.TemporaryDirectory() as d:
        edges_path = os.path.join(d, "edges")
        ck = os.path.join(d, "ck")
        q = streaming_edge_ingest(_stream_events(spark), edges_path, ck).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.read.parquet(edges_path)
        # one file = one batch, so batch-mode derivation must agree exactly
        from em_connected_components_spark.operators.normalize import canonicalize
        from em_connected_components_spark.sources.tables import edges_events

        want = canonicalize(edges_events(spark, SF))
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )


def test_streaming_ingest_to_bucketed_catalog(spark, batch_events):
    # VERDICT r3 #8 e2e: stream micro-batches into the src-BUCKETED catalog
    # table (overwrite on first batch, append after), then run CC straight
    # off the table — the plan must read the bucketed layout with NO initial
    # Exchange on the src side, and labels must agree with batch derivation.
    from em_connected_components_spark.operators.normalize import canonicalize
    from em_connected_components_spark.plans.connected_components import (
        connected_components,
    )
    from em_connected_components_spark.sources.catalog import EdgeCatalog
    from em_connected_components_spark.sources.tables import edges_events

    table = "emcc_test_stream_bucketed"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    with tempfile.TemporaryDirectory() as d:
        cat = EdgeCatalog(spark, os.path.join(d, "bucketed"), buckets=4)
        q = streaming_edge_ingest(
            _stream_events(spark),
            edge_table_path=os.path.join(d, "unused"),
            checkpoint_dir=os.path.join(d, "ck"),
            catalog=cat,
            catalog_table=table,
        ).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        br = cat.read_bucketed(table)

        # layout survives the streamed append: no Exchange for the src agg
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            br.groupBy("src").agg(F.min("dst")).explain(mode="formatted")
        plan = buf.getvalue()
        assert "Bucketed: true" in plan, plan
        assert "Exchange" not in plan, plan

        # one file = one batch, so batch-mode edge derivation agrees exactly
        want = canonicalize(edges_events(spark, SF))
        assert sorted(map(tuple, br.collect())) == sorted(
            map(tuple, want.collect())
        )

        # CC straight off the streamed table matches CC off batch edges
        got_labels = sorted(
            map(tuple, connected_components(br).collect())
        )
        want_labels = sorted(
            map(tuple, connected_components(want).collect())
        )
        assert got_labels == want_labels
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_decode_image_codec_formats_raise():
    # compressed formats need codec libs the container doesn't ship — the
    # real decoder names the format instead of silently faking it
    with pytest.raises(ValueError, match="png"):
        decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(ValueError, match="jpeg"):
        decode_image(b"\xff\xd8\xff\xe0....")
    # the deterministic twin still handles arbitrary bytes
    v1 = decode_image(b"same bytes", fake=True)
    v2 = decode_image(b"same bytes", fake=True)
    assert (v1 == v2).all()


def test_ppm_roundtrip_and_header_parse():
    import numpy as np

    from em_connected_components_spark.functions.multimodal import (
        decode_ppm,
        encode_ppm,
    )

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(5, 3, 3), dtype=np.uint8)
    assert (decode_image(encode_ppm(px)) == px).all()
    # comments + flexible whitespace in the header are part of the grammar
    raster = px.tobytes()
    weird = b"P6 # trailing comment\n# full comment line\n 3\n# again\n5 255\n"
    assert (decode_ppm(weird + raster) == px.reshape(5, 3, 3)).all()
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n3 5\n255\n" + raster[:-1])
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 6)


def test_bmp_roundtrip_orientation_and_padding():
    import numpy as np

    from em_connected_components_spark.functions.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    # width 3 -> 9-byte rows padded to 12: exercises stride logic; a
    # gradient down the rows exercises the bottom-up flip (a decoder that
    # forgot to flip would return the mirror image, not equality)
    px = np.zeros((4, 3, 3), dtype=np.uint8)
    for r in range(4):
        px[r, :, :] = 10 * r + np.arange(3).reshape(3, 1)
    data = encode_bmp(px)
    assert data[:2] == b"BM"
    assert (decode_bmp(data) == px).all()
    assert (decode_image(data) == px).all()
    # channel order: a pure-red pixel must come back pure red (BGR->RGB)
    red = np.zeros((1, 1, 3), dtype=np.uint8)
    red[0, 0, 0] = 255
    assert (decode_bmp(encode_bmp(red)) == red).all()
    with pytest.raises(ValueError, match="bit depth"):
        bad = bytearray(encode_bmp(red))
        bad[28] = 8  # claim 8bpp
        decode_bmp(bytes(bad))


def test_wav_roundtrip_and_chunk_walk():
    import numpy as np

    from em_connected_components_spark.functions.multimodal import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.RandomState(11)
    mono = rng.randint(-3000, 3000, size=200).astype(np.int16)
    got, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000 and got.shape == (200, 1)
    assert (got[:, 0] == mono).all()
    stereo = rng.randint(-3000, 3000, size=(50, 2)).astype(np.int16)
    got, rate = decode_wav(encode_wav(stereo, 44100))
    assert rate == 44100 and got.shape == (50, 2)
    assert (got == stereo).all()
    # extra chunk between fmt and data must be skipped (RIFF chunk walk)
    data = encode_wav(mono, 8000)
    fmt_end = 12 + 8 + 16
    junk = b"LIST" + (6).to_bytes(4, "little") + b"junk12"  # padded to even
    with_junk = data[:fmt_end] + junk + data[fmt_end:]
    patched = bytearray(with_junk)
    patched[4:8] = (len(with_junk) - 8).to_bytes(4, "little")
    got, rate = decode_wav(bytes(patched))
    assert (got[:, 0] == mono).all()
    with pytest.raises(ValueError, match="audio format"):
        bad = bytearray(data)
        bad[20] = 3  # claim IEEE float
        decode_wav(bytes(bad))
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\xff\xd8 not audio at all....")


def test_extract_audio_features(spark):
    import numpy as np

    from em_connected_components_spark.functions.multimodal import (
        encode_wav,
        extract_audio_features,
    )

    # constant amplitude 100 -> mean 100, rms 100; 8000 samples @ 8kHz = 1s
    wav = encode_wav(np.full(8000, 100, dtype=np.int16), 8000)
    media = spark.createDataFrame(
        [(1, bytearray(wav)), (2, None)],
        schema="media_id long, payload binary",
    )
    out = {r["media_id"]: r
           for r in extract_audio_features(media).collect()}
    r = out[1]
    assert (r["sample_rate"], r["n_channels"], r["n_samples"]) == (8000, 1, 8000)
    assert r["duration_ms"] == 1000
    assert r["mean_amp"] == pytest.approx(100.0)
    assert r["rms6"] == pytest.approx(100.0)
    assert out[2]["n_bytes"] == 0 and out[2]["rms6"] == 0.0


def test_extract_image_features_real_path(spark):
    import numpy as np

    from em_connected_components_spark.functions.multimodal import (
        encode_bmp,
        encode_ppm,
    )

    px1 = np.full((4, 4, 3), 100, dtype=np.uint8)
    px2 = np.full((2, 6, 3), 30, dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(encode_ppm(px1))), (2, bytearray(encode_bmp(px2)))],
        schema="media_id long, payload binary",
    )
    out = {r["media_id"]: r
           for r in extract_image_features(media, fake=False).collect()}
    assert (out[1]["width"], out[1]["height"]) == (4, 4)
    assert (out[2]["width"], out[2]["height"]) == (6, 2)
    assert out[1]["mean_intensity"] == pytest.approx(100.0)
    assert out[2]["mean_intensity"] == pytest.approx(30.0)
    assert len(out[1]["feature"]) == 8
    assert out[1]["n_bytes"] == len(encode_ppm(px1))


def test_extract_image_features_plumbing(spark):
    media = spark.createDataFrame(
        [(1, bytearray(b"aaaa")), (2, bytearray(b"bbbbbbbb")), (3, None)],
        schema="media_id long, payload binary",
    )
    out = extract_image_features(media, fake=True).collect()
    assert {r["media_id"] for r in out} == {1, 2, 3}
    by_id = {r["media_id"]: r for r in out}
    assert by_id[1]["n_bytes"] == 4
    assert by_id[3]["n_bytes"] == 0
    assert len(by_id[2]["feature"]) == 8
    # deterministic across runs
    again = {r["media_id"]: r for r in extract_image_features(media, fake=True).collect()}
    assert again[2]["feature"] == by_id[2]["feature"]


def test_frame_sample_plan(spark):
    media = spark.createDataFrame(
        [(1, 3500), (2, 0)], schema="media_id long, duration_ms long"
    )
    got = sorted(
        (r["media_id"], r["frame_ts_ms"])
        for r in frame_sample_plan(media, every_ms=1000).collect()
    )
    assert got == [(1, 0), (1, 1000), (1, 2000), (1, 3000), (2, 0)]


def test_running_degree_monitor_stateful(spark, batch_events):
    # stateful applyInPandasWithState: running per-node degree across
    # micro-batches must converge to the batch-mode degree table
    from em_connected_components_spark.operators.aggregates import degrees
    from em_connected_components_spark.sources import tables as tbl

    edges = tbl.edges_events(spark, SF)
    with tempfile.TemporaryDirectory() as d:
        src_dir = os.path.join(d, "edges_stream")
        os.makedirs(src_dir)
        # two files -> two micro-batches -> state actually accumulates
        e = edges.withColumn("rn", F.monotonically_increasing_id())
        e.filter(F.col("rn") % 2 == 0).select("src", "dst").coalesce(
            1
        ).write.parquet(os.path.join(src_dir, "b0"))
        e.filter(F.col("rn") % 2 == 1).select("src", "dst").coalesce(
            1
        ).write.parquet(os.path.join(src_dir, "b1"))
        stream = (
            spark.readStream.schema("src long, dst long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir + "/*")
        )
        mon = running_degree_monitor(stream, hub_threshold=3)
        q = (
            mon.writeStream.format("memory")
            .queryName("degmon")
            .outputMode("update")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # latest emission per node = final running degree
        out = spark.sql(
            """
            SELECT node, total_deg, is_hub FROM (
              SELECT *, row_number() OVER (
                PARTITION BY node ORDER BY total_deg DESC) AS rk
              FROM degmon) WHERE rk = 1
            """
        )
        got = {r["node"]: (r["total_deg"], r["is_hub"]) for r in out.collect()}
        expected = {
            r["node"]: r["degree"] for r in degrees(edges).collect()
        }
        assert len(got) == len(expected)
        for node, deg in expected.items():
            assert got[node][0] == deg
            assert got[node][1] == (deg >= 3)


def test_monitor_hub_seeds_feed_batch_heavy_split(spark):
    # e2e wiring (VERDICT r2 #6): the ONLINE hub monitor flags a mega-hub,
    # collect_hub_seeds bridges it into connected_components(hub_seeds=...),
    # and the first batch round arms the heavy-split relabel path with NO
    # degree-detect job (hub_source == "seeded" in the round metrics)
    from em_connected_components_spark.plans.connected_components import (
        CCMetrics,
        connected_components,
    )
    from em_connected_components_spark.streaming.events import (
        collect_hub_seeds,
    )

    # mega-hub star: center 1, leaves 2..500
    edges = spark.range(2, 501).select(
        F.lit(1).cast("long").alias("src"), F.col("id").alias("dst")
    )
    with tempfile.TemporaryDirectory() as d:
        src_dir = os.path.join(d, "hub_stream")
        os.makedirs(src_dir)
        e = edges.withColumn("rn", F.monotonically_increasing_id())
        for part in (0, 1):
            e.filter(F.col("rn") % 2 == part).select("src", "dst").coalesce(
                1
            ).write.parquet(os.path.join(src_dir, f"b{part}"))
        stream = (
            spark.readStream.schema("src long, dst long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir + "/*")
        )
        mon = running_degree_monitor(stream, hub_threshold=100)
        q = (
            mon.writeStream.format("memory")
            .queryName("hubmon")
            .outputMode("update")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        seeds = collect_hub_seeds(spark.table("hubmon"))
    assert seeds == [1]  # only the center crossed the threshold

    # force the shuffled relabel path so the heavy split is live
    spark.conf.set("spark.emcc.broadcast.maxRows", "10")
    try:
        metrics = CCMetrics()
        labels = connected_components(
            edges, pre_canonicalized=True, metrics=metrics,
            small_graph_threshold=0, jump_local_threshold=0,
            hub_seeds=seeds,
        )
        r0 = next(r for r in metrics.rounds if r.get("round") == 0)
        assert r0["hub_source"] == "seeded"
        assert r0["n_heavy_hitters"] == 1
        rows = labels.collect()
        assert len(rows) == 500 and {r["comp"] for r in rows} == {1}
    finally:
        spark.conf.unset("spark.emcc.broadcast.maxRows")
