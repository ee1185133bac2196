"""Multimodal plumbing (stub decoders, real Spark distribution) and the
Structured Streaming surface."""

from __future__ import annotations

import datetime
import hashlib

import pyspark.sql.functions as F
import pytest

from hpc_hd_textreuse_etl_spark.operators.multimodal import (
    DecoderNotAvailable,
    extract_features,
    media_stats,
    sample_frames,
)
from hpc_hd_textreuse_etl_spark.streaming.events import (
    read_event_stream,
    run_to_memory,
    streaming_sessions,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", "image/png", 64, 64, None, bytes(range(256)) * 4),
        (2, "image", "image/jpeg", 32, 16, None, b"\x00" * 100),
        (3, "audio", "audio/wav", None, None, 2000, b"\x10\x20" * 500),
        (4, "video", "video/mp4", 128, 128, 3500, b"\xff" * 2048),
    ]
    return spark.createDataFrame(
        rows,
        "media_id long, modality string, mime string, width int, height int, "
        "duration_ms int, payload binary",
    )


def test_extract_features_stub(spark, media):
    out = {r.media_id: r for r in extract_features(media).collect()}
    assert len(out) == 4
    assert len(out[1].feature) == 16
    assert abs(sum(out[1].feature) - 1.0) < 1e-6
    assert out[2].digest == hashlib.md5(b"\x00" * 100).hexdigest()
    assert out[3].n_bytes == 1000


def test_unknown_modality_raises(spark, media):
    bad = media.withColumn("modality", F.lit("hologram"))
    with pytest.raises(Exception, match="hologram"):
        extract_features(bad).collect()


def _fake_jpeg() -> bytes:
    # real JPEG SOI/APP0 framing, truncated body — enough to trip the
    # format sniff without being decodable
    return b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01" + b"\x00" * 64


def test_jpeg_without_pillow_raises_loudly(spark, media):
    from hpc_hd_textreuse_etl_spark.operators import multimodal as mm

    if mm._PILImage is not None:
        pytest.skip("Pillow importable: the no-Pillow JPEG path is dead here")
    jpeg = media.limit(0).union(
        spark.createDataFrame(
            [(9, "image", "image/jpeg", 8, 8, None, bytearray(_fake_jpeg()))],
            media.schema,
        )
    )
    # default: a JPEG payload with no JPEG codec is a loud capability
    # error, not a silent stub
    with pytest.raises(Exception, match="Pillow"):
        extract_features(jpeg).collect()
    # documented opt-in: stub features, run survives
    out = extract_features(jpeg, stub_missing_codecs=True).collect()
    assert len(out) == 1 and len(out[0].feature) == 16
    assert out[0].digest == hashlib.md5(_fake_jpeg()).hexdigest()


def test_jpeg_golden_fixture_under_pillow(spark):
    """Real-JPEG feature vectors verified when Pillow is importable:
    encode a deterministic RGB gradient to JPEG via Pillow, then check
    extract_features returns content-derived (not stub) features with
    exact geometry terms."""
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    w, h = 16, 12
    im = Image.new("RGB", (w, h))
    im.putdata([(x * 16 % 256, y * 21 % 256, (x + y) * 9 % 256)
                for y in range(h) for x in range(w)])
    buf = io.BytesIO()
    im.save(buf, format="JPEG", quality=95)
    payload = buf.getvalue()
    assert payload[:3] == b"\xff\xd8\xff"
    df = spark.createDataFrame(
        [(1, "image", "image/jpeg", w, h, None, bytearray(payload))],
        "media_id long, modality string, mime string, width int, height int, "
        "duration_ms int, payload binary",
    )
    row = extract_features(df).collect()[0]
    feat = list(row.feature)
    assert feat[0] == pytest.approx(w / 4096) and feat[1] == pytest.approx(h / 4096)
    assert feat[2] == pytest.approx(3 / 4)  # decoded as RGB, not stubbed
    assert sum(feat[4:]) == pytest.approx(1.0)  # luminance histogram
    assert row.digest == hashlib.md5(payload).hexdigest()


def test_media_stats_prunes_payload(spark, media):
    stats = {r.modality: r.n_items for r in media_stats(media).collect()}
    assert stats == {"image": 2, "audio": 1, "video": 1}


def test_resize_images_updates_metadata(spark, media):
    from hpc_hd_textreuse_etl_spark.operators.multimodal import resize_images

    out = resize_images(media, 16, 16).collect()
    assert len(out) == 2  # images only
    assert all(r.width == 16 and r.height == 16 for r in out)
    assert all(len(r.payload) > 0 for r in out)  # stub passes bytes through


def test_qc_summary_and_year_histogram(spark):
    import datetime

    from hpc_hd_textreuse_etl_spark.plans.qc import qc_summary, year_histogram

    df = spark.createDataFrame(
        [(1, datetime.date(1700, 1, 1)), (2, datetime.date(1700, 6, 1)), (3, None)],
        "id int, d date",
    )
    s = qc_summary(df)
    assert s["rows"] == 3 and s["null_d"] == 1 and s["null_id"] == 0
    hist = {r.year: r.n for r in year_histogram(df, "d").collect()}
    assert hist[1700] == 2


def test_sample_frames(spark, media):
    frames = sample_frames(media, every_ms=1000).collect()
    # 3500ms video sampled at 0,1000,2000,3000
    assert [r.frame_ms for r in frames] == [0, 1000, 2000, 3000]


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "events")
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for uid, offsets in [(1, [0, 60, 120, 7200]), (2, [30, 90])]:
        for i, off in enumerate(offsets):
            rows.append(
                (uid * 100 + i, base + datetime.timedelta(seconds=off), uid, "click", 1.0)
            )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    df.write.mode("overwrite").parquet(path)
    return path


def test_windowed_counts_stream(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    assert stream.isStreaming
    run_to_memory(windowed_event_counts(stream, window="1 hour"), "win_counts", output_mode="complete")
    rows = spark.sql("select * from win_counts").collect()
    got = {(r.window_start, r.n) for r in rows}
    assert sum(r.n for r in rows) == 6
    assert len(rows) == 2  # hour 0 (5 events) and hour 2 (1 event)


def test_watermark_drops_late_events(spark, tmp_path):
    """Two micro-batches through a checkpointed query: an event arriving
    far behind the advanced watermark is dropped; one inside the
    lateness allowance is kept."""
    import time

    path = str(tmp_path / "late-events")
    ckpt = str(tmp_path / "ckpt")
    base = datetime.datetime(2024, 1, 1)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    def write_batch(rows, mode):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(mode).parquet(path)

    out = str(tmp_path / "out")

    def drain():
        stream = read_event_stream(spark, path)
        q = (
            windowed_event_counts(stream, window="10 minutes", watermark="10 minutes")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1 advances event time (and thus the watermark) to ~2h
    write_batch(
        [(i, base + datetime.timedelta(hours=2, seconds=i), 1, "click", 1.0) for i in range(3)],
        "overwrite",
    )
    drain()
    # batch 2: one hopeless straggler (hour 0, far past the watermark)
    # and one fresh event
    write_batch(
        [
            (100, base, 1, "click", 1.0),
            (101, base + datetime.timedelta(hours=3), 1, "click", 1.0),
        ],
        "append",
    )
    drain()
    rows = spark.read.parquet(out).collect()
    starts = {r.window_start for r in rows}
    # the hour-0 straggler's window never appears in the emitted output
    assert base not in starts
    total = sum(r.n for r in rows)
    assert total >= 3  # the on-time windows were finalized and emitted


def test_streaming_sessions_match_batch_semantics(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    run_to_memory(streaming_sessions(stream, gap="30 minutes"), "sessions", output_mode="complete")
    rows = spark.sql("select * from sessions").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    # user 1: events at 0,60,120s then 7200s → 2 sessions
    assert len(by_user[1]) == 2
    # user 2: 30,90s → 1 session
    assert len(by_user[2]) == 1


def test_streaming_active_users_matches_batch(spark, tmp_path):
    """Batch-equivalence for the streaming WAU: every sliding window's
    count equals the batch sliding_distinct_count at report_day =
    window_end - 1 day (the trailing-window alignment), fed through two
    micro-batches to exercise the stateful dedup across batches."""
    from hpc_hd_textreuse_etl_spark.operators.temporal import (
        sliding_distinct_count,
    )
    from hpc_hd_textreuse_etl_spark.streaming.events import (
        streaming_active_users,
    )

    path = str(tmp_path / "wau-events")
    base = datetime.datetime(2024, 3, 1)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    rows = []
    eid = 0
    for uid, days in [(1, [0, 0, 2, 9]), (2, [0, 1]), (3, [5, 5, 6])]:
        for d in days:
            rows.append((eid, base + datetime.timedelta(days=d, hours=uid), uid, "click", 1.0))
            eid += 1
    # two micro-batches (file-per-batch via maxFilesPerTrigger)
    spark.createDataFrame(rows[:4], schema).coalesce(1).write.mode("overwrite").parquet(path)
    spark.createDataFrame(rows[4:], schema).coalesce(1).write.mode("append").parquet(path)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
    q = (
        streaming_active_users(stream, window_days=7, watermark="30 days")
        .writeStream.format("memory").queryName("wau").outputMode("complete").start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["report_day"].date(): r["active_entities"]
        for r in spark.sql("select * from wau").collect()
    }

    batch_df = spark.createDataFrame(rows, schema)
    want = {
        r["report_day"]: r["active_entities"]
        for r in sliding_distinct_count(batch_df, "ts", "user_id", 7).collect()
    }
    # streaming emits windows beyond the observed span (no clip); on the
    # span both agree exactly
    for day, n in want.items():
        assert got[day] == n, (day, got.get(day), n)


def test_streaming_decayed_counters_match_batch(spark, tmp_path):
    """Two micro-batches of additive scaled-integer partials; the read
    side must equal the batch decayed_sum over everything — bit-exact,
    including the derived double. A replayed batch (same batch_id dir
    overwritten) must not double-count."""
    from hpc_hd_textreuse_etl_spark.operators.temporal import decayed_sum
    from hpc_hd_textreuse_etl_spark.streaming.sinks import (
        read_decayed_counters,
        streaming_decayed_counters,
    )

    src = str(tmp_path / "dc-events")
    out = str(tmp_path / "dc-state")
    ckpt = str(tmp_path / "dc-ckpt")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    base = datetime.datetime(2023, 1, 1)
    rows = [
        (i, base + datetime.timedelta(days=400 * (i % 4)), i % 3, "click",
         100.25 + i)
        for i in range(12)
    ]
    spark.createDataFrame(rows[:6], schema).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(rows[6:], schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = streaming_decayed_counters(
        stream, out, ckpt, ["user_id"], "value", "ts",
        as_of="2027-01-01 00:00:00", half_life="365 days",
    )
    q.awaitTermination()
    got = {
        r["user_id"]: (r["decayed_value_scaled"], r["decayed_value_n"], r["decayed_value"])
        for r in read_decayed_counters(spark, out, ["user_id"]).collect()
    }
    want = {
        r["user_id"]: (r["decayed_value_scaled"], r["decayed_value_n"], r["decayed_value"])
        for r in decayed_sum(
            spark.createDataFrame(rows, schema).withColumnRenamed("user_id", "user_id"),
            ["user_id"], "value", "ts",
            as_of="2027-01-01 00:00:00", half_life="365 days",
        ).collect()
    }
    assert got == want
    # replay convergence: rewrite batch 0's directory with the same
    # partials (what a crash-replay does) — totals must not change
    import glob
    b0 = glob.glob(out + "/batch_id=*")[0]
    stash = str(tmp_path / "replayed-partials")  # outside the sink path
    spark.read.parquet(b0).write.mode("overwrite").parquet(stash)
    spark.read.parquet(stash).write.mode("overwrite").parquet(b0)
    again = {
        r["user_id"]: (r["decayed_value_scaled"], r["decayed_value_n"], r["decayed_value"])
        for r in read_decayed_counters(spark, out, ["user_id"]).collect()
    }
    assert again == want


# ---------------------------------------------------------------------------
# Perceptual image hashing (dHash / aHash)
# ---------------------------------------------------------------------------


def _flat_png(value: int, w: int = 16, h: int = 16) -> bytes:
    from hpc_hd_textreuse_etl_spark.functions.png_codec import png_encode

    return png_encode(w, h, 1, bytes([value] * (w * h)))


def _gradient_png(w: int = 16, h: int = 16) -> bytes:
    from hpc_hd_textreuse_etl_spark.functions.png_codec import png_encode

    return png_encode(w, h, 1, bytes(bytearray((c * 255) // (w - 1) for _ in range(h) for c in range(w))))


def test_dhash_known_values():
    """A flat image has no horizontal gradient (all bits 0); a strictly
    increasing gradient sets every bit → phash == signed -1 wrap of
    0xFFFF...; both are hand-checkable anchors."""
    from hpc_hd_textreuse_etl_spark.operators.multimodal import dhash_bytes

    assert dhash_bytes(_flat_png(77)) == 0
    # gradient: p[r][c] < p[r][c+1] everywhere → every comparison is
    # False under '>' ... bits 0. Reverse gradient sets all 64 bits.
    from hpc_hd_textreuse_etl_spark.functions.png_codec import png_encode

    rev = png_encode(
        16, 16, 1,
        bytes(bytearray(255 - (c * 255) // 15 for _ in range(16) for c in range(16))),
    )
    assert dhash_bytes(_gradient_png()) == 0
    assert dhash_bytes(rev) == -1  # all 64 bits set, two's-complement


def test_ahash_flat_and_split():
    from hpc_hd_textreuse_etl_spark.functions.png_codec import png_encode
    from hpc_hd_textreuse_etl_spark.operators.multimodal import ahash_bytes

    assert ahash_bytes(_flat_png(10)) == 0  # p*n > total is strict
    # left half 0, right half 255: right-half bits set
    pixels = bytes(bytearray(0 if c < 8 else 255 for _ in range(16) for c in range(16)))
    ph = ahash_bytes(png_encode(16, 16, 1, pixels))
    for r in range(8):
        for c in range(8):
            bit = (ph >> (r * 8 + c)) & 1 if ph >= 0 else ((ph + (1 << 64)) >> (r * 8 + c)) & 1
            assert bit == (1 if c >= 4 else 0)


def test_perceptual_hashes_operator_and_rgb(spark):
    """The operator matches the driver-side function per row, and RGB
    images go through the integer luminance plane."""
    from hpc_hd_textreuse_etl_spark.functions.png_codec import png_encode
    from hpc_hd_textreuse_etl_spark.operators.multimodal import (
        dhash_bytes,
        perceptual_image_hashes,
    )

    rgb = png_encode(
        8, 8, 3,
        bytes(bytearray((c * 30) % 256 for _ in range(8) for c in range(8) for _ in range(3))),
    )
    rows = [(1, _flat_png(5)), (2, _gradient_png()), (3, rgb)]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    got = {
        r["media_id"]: r["phash"]
        for r in perceptual_image_hashes(df, "media_id", "data").collect()
    }
    want = {i: dhash_bytes(payload) for i, payload in rows}
    assert got == want
    with pytest.raises(ValueError):
        perceptual_image_hashes(df, "media_id", "data", method="md5")


def test_signature_banding_is_lossless(spark):
    """Pigeonhole guarantee: banded candidate generation recovers every
    pair within the radius that a brute-force scan finds."""
    import random

    from hpc_hd_textreuse_etl_spark.operators.dedup import (
        signature_near_duplicates,
    )

    rng = random.Random(9)
    sigs = []
    for i in range(60):
        base = rng.getrandbits(63)
        sigs.append((i, base))
        # plant near-dups: flip 1-2 bits
        sigs.append((i + 1000, base ^ (1 << rng.randrange(64))))
        if i % 3 == 0:
            sigs.append(
                (i + 2000, base ^ (1 << rng.randrange(64)) ^ (1 << rng.randrange(64)))
            )

    def signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    sigs = [(i, signed(s)) for i, s in sigs]
    df = spark.createDataFrame(sigs, "id long, sig long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in signature_near_duplicates(df, "id", "sig", max_hamming=2).collect()
    }
    want = set()
    for ia, sa in sigs:
        for ib, sb in sigs:
            if ia < ib:
                hd = bin((sa ^ sb) & ((1 << 64) - 1)).count("1")
                if hd <= 2:
                    want.add((ia, ib, hd))
    assert got == want


def test_perceptual_hashes_null_payloads_and_id_dtypes(spark):
    """NULL image payloads are dropped (not a TypeError mid-batch);
    narrow integer ids are normalized to long before the Arrow exchange;
    non-integer non-string id dtypes fail fast with a clear message."""
    from hpc_hd_textreuse_etl_spark.functions.png_codec import png_encode
    from hpc_hd_textreuse_etl_spark.operators.multimodal import (
        dhash_bytes,
        perceptual_image_hashes,
    )

    png = png_encode(8, 8, 1, bytes(range(64)))
    df = spark.createDataFrame(
        [(1, png), (2, None)], "media_id smallint, data binary"
    )
    rows = perceptual_image_hashes(df, "media_id", "data").collect()
    assert [(r.media_id, r.phash) for r in rows] == [(1, dhash_bytes(png))]
    assert dict(
        perceptual_image_hashes(df, "media_id", "data").dtypes
    )["media_id"] == "bigint"
    bad = df.withColumn("media_id", F.col("media_id").cast("double"))
    with pytest.raises(ValueError, match="id dtype"):
        perceptual_image_hashes(bad, "media_id", "data")
