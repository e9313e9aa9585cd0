"""Text analysis, ANN, multimodal plumbing, windowed aggregation."""

import pytest
from pyspark.sql import functions as F

from etl_rs_spark.functions import text as tx
from etl_rs_spark.functions.similarity import cosine, dot, euclidean
from etl_rs_spark.operators.ann import IvfIndex, cosine_topk
from etl_rs_spark.operators.multimodal import (
    extract_image_features,
    gen_fake_assets,
    image_assets_from_ids,
    image_stats,
    resize_images,
    sample_audio_frames,
    wav_assets_from_ids,
    wav_frames,
)
from etl_rs_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)


# ------------------------------------------------------------------ text --
def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat is in the house and it is warm",),
            ("el gato esta en la casa y se duerme en los cojines",),
            ("der hund und die katze sind in den garten mit sich",),
            ("xyzzy plugh",),
            ("",),
        ],
        "t string",
    )
    got = [r[0] for r in df.select(tx.lang_id("t")).collect()]
    assert got == ["en", "es", "de", "und", None]


def test_token_counts_and_quality(spark):
    df = spark.createDataFrame([("the cat sat, on mat!",)], "t string")
    row = df.select(
        tx.token_count("t").alias("n"),
        tx.bpe_ish_token_count("t").alias("bpe"),
        tx.punct_ratio("t").alias("pr"),
        tx.quality_score("t").alias("q"),
    ).collect()[0]
    assert row["n"] == 5
    assert row["bpe"] >= 7  # punctuation split out
    assert 0 < row["pr"] < 0.2
    assert 0 <= row["q"] <= 1


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("hello world",), ("other",)], "t string"
    )
    fps = [r[0] for r in df.select(tx.fingerprint("t")).collect()]
    assert fps[0] == fps[1] != fps[2]  # case/whitespace-insensitive


def test_shingle_fingerprint_near_dup(spark):
    a = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame([(a,), (a + " eleven",)], "t string")
    fps = [r[0] for r in df.select(tx.shingle_fingerprint("t", k=3)).collect()]
    assert fps[0] == fps[1]  # min-shingle survives a suffix edit


# ------------------------------------------------------------------- ann --
def test_similarity_exprs(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 2.0])], "a array<double>, b array<double>"
    )
    row = df.select(
        dot("a", "b").alias("d"),
        cosine("a", "a").alias("c"),
        euclidean("a", "b").alias("e"),
    ).collect()[0]
    assert row["d"] == 0.0
    assert abs(row["c"] - 1.0) < 1e-9
    assert abs(row["e"] - 5**0.5) < 1e-9


def test_cosine_topk_and_ivf_recall(spark):
    import random

    random.seed(3)
    clusters = {c: [random.gauss(0, 1) for _ in range(16)] for c in range(4)}
    rows = []
    for i in range(400):
        c = i % 4
        rows.append(
            (i, [x + random.gauss(0, 0.05) for x in clusters[c]])
        )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    q = clusters[0]

    exact = [r["vec_id"] for r in cosine_topk(df, q, k=20).collect()]
    assert all(v % 4 == 0 for v in exact)  # all from cluster 0

    idx = IvfIndex(nlist=4, nprobe=1, seed=1).fit(df)
    approx = [r["vec_id"] for r in idx.search(q, k=20).collect()]
    recall = len(set(exact) & set(approx)) / 20
    assert recall >= 0.9  # clustered data: 1 probe finds the home cluster
    idx.unpersist()
    df.unpersist()


# ------------------------------------------------------------ multimodal --
def test_image_feature_plumbing(spark):
    assets = gen_fake_assets(spark, n=32)
    feats = extract_image_features(assets, fake=True)
    rows = feats.collect()
    assert len(rows) == 32
    assert all(len(r["features"]) == 16 for r in rows)
    # deterministic across runs
    again = extract_image_features(gen_fake_assets(spark, n=32), fake=True)
    assert rows[0]["features"] == again.collect()[0]["features"]


def test_real_image_stats_exact(spark):
    """REAL decode kernels (no PIL): solid-color ppm/bmp/pgm assets have
    closed-form channel means, and image_stats must hit them exactly."""
    ids = spark.range(30).withColumnRenamed("id", "asset_id")
    assets = image_assets_from_ids(ids)
    got = {r["asset_id"]: r for r in image_stats(assets).collect()}
    assert len(got) == 30
    for i in range(30):
        r = got[i]
        assert r["fmt"] == ["ppm", "bmp", "pgm"][i % 3]
        assert (r["width"], r["height"]) == (8 + i % 9, 8 + i % 7)
        if i % 3 == 2:  # grayscale: all channels = the gray value
            assert r["mean_r"] == r["mean_g"] == r["mean_b"] == float(i % 256)
        else:
            assert r["mean_r"] == float(i % 256)
            assert r["mean_g"] == float(7 * i % 256)
            assert r["mean_b"] == float(13 * i % 256)


def test_real_feature_vector(spark):
    ids = spark.range(9).withColumnRenamed("id", "asset_id")
    feats = extract_image_features(image_assets_from_ids(ids)).collect()
    assert len(feats) == 9
    for r in feats:
        v = r["features"]
        i = r["asset_id"]
        assert len(v) == 16
        assert v[0] == float(8 + i % 9) and v[1] == float(8 + i % 7)  # w, h
        assert v[5] == v[6] == v[7] == 0.0  # solid color: zero std
        assert abs(sum(v[8:16]) - 1.0) < 1e-12  # normalized histogram


def test_real_resize_roundtrip_preserves_color_and_format(spark):
    from etl_rs_spark.functions import codecs

    ids = spark.range(12).withColumnRenamed("id", "asset_id")
    assets = image_assets_from_ids(ids).withColumn("width", F.lit(0)).withColumn(
        "height", F.lit(0)
    )
    resized = resize_images(assets, 6, 5, fake=False)
    rows = {r["asset_id"]: r for r in resized.collect()}
    assert all((r["width"], r["height"]) == (6, 5) for r in rows.values())
    stats = {r["asset_id"]: r for r in image_stats(resized).collect()}
    for i in range(12):
        assert codecs.sniff(rows[i]["content"]) == ["ppm", "bmp", "pgm"][i % 3]
        s = stats[i]
        assert (s["width"], s["height"]) == (6, 5)
        # bilinear resize of a constant image is exactly constant
        assert s["mean_r"] == float(i % 256 if i % 3 == 2 else i % 256)
        assert s["mean_g"] == float(i % 256 if i % 3 == 2 else 7 * i % 256)


def test_unknown_format_raises_in_kernel(spark):
    """Undecodable bytes must fail loudly at execution, naming the
    sniffed format — never silently emit NULL features."""
    from py4j.protocol import Py4JJavaError

    assets = gen_fake_assets(spark, n=2)  # sha2 bytes: not a real image
    feats = extract_image_features(assets, fake=False)
    with pytest.raises((Py4JJavaError, Exception), match="unknown"):
        feats.collect()
    resized = resize_images(assets, 64, 64, fake=False)
    with pytest.raises((Py4JJavaError, Exception), match="unknown"):
        resized.collect()
    # the fake plumbing path is unaffected
    assert extract_image_features(assets, fake=True).count() == 2


def test_real_wav_frames_exact(spark):
    """REAL WAV decode: constant-amplitude PCM gives closed-form RMS."""
    ids = spark.range(20).withColumnRenamed("id", "asset_id")
    audio = wav_assets_from_ids(ids)
    rows = wav_frames(audio, every_ms=25).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["asset_id"], []).append(r)
    for i in range(20):
        frames = sorted(by_id[i], key=lambda r: r["frame_idx"])
        assert len(frames) == 2 + i % 3
        for fr in frames:
            assert fr["n_samples"] == 200
            assert fr["rms"] == abs(i % 2000 - 1000) / 32768.0


def test_real_audio_frame_sampling(spark):
    """sample_audio_frames real path frames the DECODED sample stream
    (not metadata): 8kHz * 50..100ms at every_ms=25 -> 2..4 frames."""
    ids = spark.range(6).withColumnRenamed("id", "asset_id")
    audio = wav_assets_from_ids(ids)
    per = {
        r["asset_id"]: r["count"]
        for r in sample_audio_frames(audio, every_ms=25, fake=False)
        .groupBy("asset_id")
        .count()
        .collect()
    }
    assert per == {i: 2 + i % 3 for i in range(6)}


def test_resize_and_frame_sampling_fake(spark):
    assets = gen_fake_assets(spark, n=8)
    resized = resize_images(assets, 64, 48, fake=True)
    got = resized.select("width", "height").distinct().collect()
    assert [(r["width"], r["height"]) for r in got] == [(64, 48)]

    audio = assets.withColumn("duration_ms", F.lit(3500))
    frames = sample_audio_frames(audio, every_ms=1000, fake=True)
    per = frames.groupBy("asset_id").count().collect()
    assert all(r["count"] == 3 for r in per)  # 3500ms // 1000ms


# --------------------------------------------------------------- windows --
@pytest.fixture(scope="module")
def ticks(spark):
    rows = [
        ("u1", "2024-01-01 00:00:05", 1.0),
        ("u1", "2024-01-01 00:00:55", 2.0),
        ("u1", "2024-01-01 00:01:10", 4.0),
        ("u1", "2024-01-01 00:05:00", 8.0),  # separate session (gap > 2m)
        ("u2", "2024-01-01 00:00:30", 16.0),
    ]
    return spark.createDataFrame(rows, "uid string, ts_s string, v double").select(
        "uid", F.to_timestamp("ts_s").alias("ts"), "v"
    )


def test_tumbling(ticks):
    out = tumbling_window_agg(
        ticks, "ts", "1 minute", [F.sum("v").alias("v_sum")], group_by=["uid"]
    )
    got = {
        (r["uid"], str(r["window_start"])): r["v_sum"] for r in out.collect()
    }
    assert got[("u1", "2024-01-01 00:00:00")] == 3.0
    assert got[("u1", "2024-01-01 00:01:00")] == 4.0
    assert got[("u2", "2024-01-01 00:00:00")] == 16.0


def test_sliding(ticks):
    out = sliding_window_agg(
        ticks, "ts", "2 minutes", "1 minute", [F.count("*").alias("n")],
        group_by=["uid"],
    )
    # row at 00:00:05 belongs to windows starting 23:59 and 00:00
    n_windows = out.where("uid = 'u1'").count()
    assert n_windows >= 4


def test_session(ticks):
    out = session_window_agg(
        ticks, "ts", "2 minutes", [F.count("*").alias("n")], group_by=["uid"]
    )
    u1 = sorted(r["n"] for r in out.where("uid = 'u1'").collect())
    assert u1 == [1, 3]  # burst of 3, then isolated event


def test_ivf_partitioned_index_prunes_scan(spark, tmp_path):
    """fit(path=...) materializes one parquet partition per coarse cell;
    search() must read only the nprobe probed partitions (real partition
    pruning — the 10^10-row posture, nothing pinned in memory), and
    nlist auto-sizes from the data when unset."""
    import random

    from etl_rs_spark import plans

    random.seed(3)
    clusters = {c: [random.gauss(0, 1) for _ in range(16)] for c in range(4)}
    rows = [
        (i, [x + random.gauss(0, 0.05) for x in clusters[i % 4]])
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = clusters[0]

    idx = IvfIndex(nlist=4, nprobe=1, seed=1).fit(df, path=str(tmp_path / "ivf"))
    res = idx.search(q, k=20)
    plan = plans.physical_plan(res)
    assert "PartitionFilters" in plan and "__list" in plan.split("PartitionFilters")[1][:200]
    exact = [r["vec_id"] for r in cosine_topk(df, q, k=20).collect()]
    approx = [r["vec_id"] for r in res.collect()]
    assert len(set(exact) & set(approx)) / 20 >= 0.9

    # auto nlist: ~sqrt(N), never above the fit sample
    auto = IvfIndex(nprobe=2, seed=1).fit(df, path=str(tmp_path / "ivf2"))
    assert 1 <= auto.nlist <= 20  # sqrt(400) == 20
