"""Webpages fixture, byte-identity extraction invariant, flagship metric
pipeline, and multimodal (binary) actor-pool plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from p2pddsketch_ray.sources.webpages import (LANGS, generate_webpages,
                                              generate_webpages_local,
                                              make_rows)
from p2pddsketch_ray.stages.extract import extract_text

from .test_ddsketch import exact_quantile, rel_err


@pytest.fixture(scope="module")
def pages() -> pa.Table:
    return generate_webpages_local(2000)


def test_schema_and_determinism(pages):
    assert pages.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    again = generate_webpages_local(2000)
    assert pages.equals(again)
    # partition-independence: rows generated in any batching are identical
    chunk = make_rows(np.arange(500, 700))
    assert chunk.equals(pages.slice(500, 200))


def test_extraction_byte_identity(pages):
    """The driver invariant: extract_text(html) == text, byte for byte."""
    for i in range(pages.num_rows):
        html = pages["html"][i].as_py()
        assert extract_text(html).encode() == pages["text"][i].as_py().encode()


def test_lang_skew(pages):
    langs = pages["lang"].to_pylist()
    frac_en = langs.count("en") / len(langs)
    assert 0.5 < frac_en < 0.7           # Zipf head
    assert set(langs) <= set(LANGS)


def test_planted_duplicates(pages):
    texts = pages["text"].to_pylist()
    # exact dups: i % 53 == 3 with base source at i-3
    found_exact = sum(1 for i in range(3, len(texts))
                      if i % 53 == 3 and texts[i].split("\n", 1)[-1] ==
                      texts[i - 3].split("\n", 1)[-1])
    assert found_exact > 10
    # near dups: i % 37 == 1, body = source body + " extra"
    bodies = [t.split("\n", 1)[-1] for t in texts]
    found_near = sum(1 for i in range(1, len(texts))
                     if i % 37 == 1 and bodies[i] == bodies[i - 1] + " extra")
    assert found_near > 10


def test_heavy_tail_lengths(pages):
    lens = np.array([len(t) for t in pages["text"].to_pylist()])
    assert np.quantile(lens, 0.99) > 4 * np.median(lens)


def test_flagship_pipeline_accuracy(ray_session, tmp_path):
    import pyarrow.parquet as pq
    from p2pddsketch_ray.pipelines.webpages import webpage_quantiles
    path = str(tmp_path / "pages")
    generate_webpages(path, 4000, num_blocks=8)
    files = sorted(__import__("glob").glob(f"{path}/*.parquet"))
    assert len(files) >= 2              # partitioned output
    table = pa.concat_tables([pq.read_table(f, columns=["text", "lang"])
                              for f in files])
    true_lens = np.array([len(t) for t in table["text"].to_pylist()],
                         dtype=np.float64)
    glob_t, grouped = webpage_quantiles(path, "text_len",
                                        (0.5, 0.95, 0.99), verify=True)
    for q, est in zip(glob_t["q"].to_pylist(), glob_t["est"].to_pylist()):
        real = exact_quantile(true_lens, q)
        assert rel_err(est, real) <= 0.01 + 1e-12
    gdf = grouped.to_pandas()
    langs = table["lang"].to_pylist()
    for lang in ("en", "de"):
        sub = np.array([l_ for l_, g in zip(true_lens, langs) if g == lang])
        row = gdf[(gdf["lang"] == lang) & (gdf["q"] == 0.5)].iloc[0]
        assert rel_err(row["est"], exact_quantile(sub, 0.5)) <= 0.01 + 1e-12


def test_extraction_verify_catches_corruption(ray_session, tmp_path):
    import ray.data
    from p2pddsketch_ray.pipelines.webpages import webpage_metrics_ds
    t = generate_webpages_local(50)
    # corrupt one text cell
    texts = t["text"].to_pylist()
    texts[7] = texts[7] + "XX"
    bad = t.set_column(3, "text", pa.array(texts, type=pa.string()))
    path = str(tmp_path / "bad.parquet")
    import pyarrow.parquet as pq
    pq.write_table(bad, path)
    with pytest.raises(Exception) as exc_info:
        webpage_metrics_ds(path, verify=True).to_pandas()
    assert "extraction mismatch" in str(exc_info.value)


def test_multimodal_binary_features(ray_session, tmp_path):
    import ray.data
    from p2pddsketch_ray.stages.multimodal import BinaryFeatureExtract
    t = generate_webpages_local(300)
    ds = ray.data.from_arrow(t.select(["html"]))
    out = ds.map_batches(BinaryFeatureExtract, batch_format="pyarrow",
                         batch_size=64, concurrency=2, num_cpus=1).to_pandas()
    assert len(out) == 300
    assert (out["payload_size"] > 0).all()
    feats = np.stack(out["features"].to_numpy())
    assert feats.shape == (300, 16)
    np.testing.assert_allclose(feats.sum(axis=1), 1.0, atol=1e-9)
    # deterministic across runs
    out2 = ds.map_batches(BinaryFeatureExtract, batch_format="pyarrow",
                          batch_size=64, concurrency=2, num_cpus=1).to_pandas()
    assert np.array_equal(feats, np.stack(out2["features"].to_numpy()))
    # decode="real" constructs (uncompressed-container parsers) but
    # rejects payloads that would need codec libraries
    with pytest.raises(ValueError):
        BinaryFeatureExtract(decode="nope")
    ext = BinaryFeatureExtract(column="html", decode="real")
    with pytest.raises(ValueError):
        ext(t.select(["html"]).slice(0, 4))     # html is not BMP/PPM


def test_multimodal_grouped_pipeline_matches_numpy(ray_session):
    """binary_features_by_group over documents: byte counts and the mean
    feature vector both reproduce a local numpy computation."""
    import pyarrow.parquet as pq
    import ray.data
    from p2pddsketch_ray.stages.multimodal import (_byte_histogram_features,
                                                   binary_features_by_group)
    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{sf}/documents.parquet",
                               columns=["lang", "text"])
    out = binary_features_by_group(ds, "text", "lang").to_pandas()
    t = pq.read_table(f"{sf}/documents.parquet", columns=["lang", "text"])
    texts = t["text"].to_pylist()
    langs = np.asarray(t["lang"].to_pylist())
    payload = pa.array([s.encode() for s in texts], type=pa.binary())
    feats = _byte_histogram_features(payload)
    sizes = np.asarray([len(s.encode()) for s in texts])
    for _, row in out.iterrows():
        m = langs == row["lang"]
        assert row["n_docs"] == int(m.sum())
        assert row["sum_payload_bytes"] == int(sizes[m].sum())
        micro = np.floor(feats[m] * 1e6 + 0.5)
        want = micro.sum(axis=0) / 1e6 / m.sum()
        np.testing.assert_allclose(np.asarray(row["mean_features"]), want,
                                   atol=1e-12)


def test_fused_sketch_build_matches_unfused(ray_session, tmp_path):
    """The scaling-bench fused pipeline (extract-verify + text metrics +
    DDSketch + MinHash in ONE map) must reproduce the unfused flagship
    quantiles bit-identically and aggregate the same text metrics."""
    import pyarrow.parquet as pq
    from p2pddsketch_ray.functions.text import token_count
    from p2pddsketch_ray.pipelines.webpages import (fused_sketch_build,
                                                    webpage_quantiles)
    path = str(tmp_path / "pages")
    generate_webpages(path, 1500, num_blocks=6)
    res = fused_sketch_build(path, (0.5, 0.95, 0.99))
    glob_t, grouped = webpage_quantiles(path, "text_len",
                                        (0.5, 0.95, 0.99), verify=True)
    assert res["global"].equals(glob_t)           # bit-identical estimates
    assert res["per_lang"].select(["lang", "q", "est"]).equals(
        grouped.select(["lang", "q", "est"]))
    assert res["docs"] == 1500
    assert res["cpu_sec"] > 0
    # token total matches a direct count over the raw table
    files = sorted(__import__("glob").glob(f"{path}/*.parquet"))
    table = pa.concat_tables([pq.read_table(f, columns=["text"])
                              for f in files])
    want = sum(token_count(table["text"].combine_chunks()).to_pylist())
    assert res["tokens"] == want
    # checksum is deterministic across runs (drives the bench's
    # cross-parallelism consistency assertion)
    res2 = fused_sketch_build(path, (0.5, 0.95, 0.99))
    assert res2["band_checksum"] == res["band_checksum"]


def test_frame_sample_matches_naive():
    """FrameSample's vectorized flat-buffer gather == per-row slicing."""
    from p2pddsketch_ray.stages.multimodal import FrameSample
    payloads = [bytes(range(256)) * 5 + b"tail",   # 5 full frames + tail
                b"",                                # empty
                b"x" * 255,                         # shorter than a frame
                bytes(range(200, 256)) * 100,       # many frames
                b"y" * 256]                         # exactly one frame
    fb, every = 256, 4
    t = pa.table({"payload": pa.array(payloads, type=pa.binary())})
    out = FrameSample(column="payload", frame_bytes=fb, every=every)(t)
    for i, p in enumerate(payloads):
        frames = [p[j * fb:(j + 1) * fb] for j in range(len(p) // fb)]
        sampled = b"".join(frames[::every])
        assert out["n_frames"][i].as_py() == len(frames)
        assert out["n_sampled"][i].as_py() == len(frames[::every])
        assert out["sampled"][i].as_py() == sampled


def test_frame_sample_real_decode_rejects_codec_formats():
    import pytest
    from p2pddsketch_ray.stages.multimodal import FrameSample, Resize
    # real mode constructs (pure-numpy WAV/raster parsers) but raises
    # for payloads that genuinely need codec libraries
    junk = pa.table({"payload": pa.array([b"\x89PNG\r\n\x1a\nxxxx"],
                                         type=pa.large_binary())})
    with pytest.raises(ValueError):
        FrameSample(decode="real")(junk)
    with pytest.raises(ValueError):
        Resize(decode="real")(junk)
    with pytest.raises(ValueError):
        FrameSample(decode="bogus")
    with pytest.raises(ValueError):
        Resize(decode="bogus")


def test_resize_matches_naive():
    """Resize's broadcast index grid == per-row nearest-neighbor loops."""
    from p2pddsketch_ray.stages.multimodal import Resize
    rng = np.random.default_rng(3)
    payloads = [bytes(rng.integers(0, 256, size=n, dtype=np.uint8).tolist())
                for n in (5000, 64, 63, 1, 0, 4096)]
    stride, target = 64, 8
    t = pa.table({"payload": pa.array(payloads, type=pa.binary())})
    out = Resize(column="payload", stride=stride, target=target)(t)
    for i, p in enumerate(payloads):
        got = np.asarray(out["thumb"][i].as_py(), dtype=np.int64)
        if len(p) == 0:
            assert (got == 0).all()
            continue
        H = max((len(p) + stride - 1) // stride, 1)
        want = []
        for j in range(target):
            r = (j * H) // target
            for k_ in range(target):
                c = (k_ * stride) // target
                want.append(p[min(r * stride + c, len(p) - 1)])
        assert got.tolist() == want
        assert out["payload_size"][i].as_py() == len(p)


def test_frame_sample_grouped_pipeline(ray_session):
    """The grouped rollup's integer plumbing matches direct arithmetic."""
    import pyarrow.parquet as pq
    from p2pddsketch_ray.stages.multimodal import frame_sample_stats_by_group
    import ray.data
    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{sf}/documents.parquet",
                               columns=["lang", "text"])
    got = (frame_sample_stats_by_group(ds, "text", "lang").to_pandas()
           .sort_values("lang").reset_index(drop=True))
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["lang", "text"]).to_pandas()
    docs["nf"] = docs["text"].str.len() // 256
    docs["ns"] = (docs["nf"] + 3) // 4
    want = (docs.groupby("lang")
            .agg(n_docs=("text", "size"), sum_frames=("nf", "sum"),
                 sum_sampled=("ns", "sum")).reset_index())
    assert got["n_docs"].tolist() == want["n_docs"].tolist()
    assert got["sum_frames"].tolist() == want["sum_frames"].tolist()
    assert got["sum_sampled"].tolist() == want["sum_sampled"].tolist()
    assert (got["sum_sampled_bytes"] == got["sum_sampled"] * 256).all()
