"""End-to-end CLI smoke test: synthetic dataset, debug models, full pipeline
through the reference CSV schema (the minimum end-to-end slice, SURVEY.md §7.2).
"""

import json

import numpy as np
import pandas as pd

from multimodal_embedding_tpu.cli.main import main

EXPECTED_METRICS = [
    f"{proto}_R@{k}" for proto in ("T2I", "I2T", "I2T_Sym") for k in (1, 5, 10)
]


def test_cli_synthetic_end_to_end(tmp_path):
    out = tmp_path / "results.csv"
    rc = main(
        [
            "--dataset", "synthetic",
            "--debug-models",
            "--models", "OpenAI-CLIP-L,SigLIP-400M",
            "--sample-size", "48",
            "--bootstrap-iterations", "12",
            "--batch-size", "16",
            "--encode-passes", "2",
            "--output", str(out),
        ]
    )
    assert rc == 0
    df = pd.read_csv(out)
    assert list(df["Model"]) == ["OpenAI-CLIP-L", "SigLIP-400M"]

    # exact reference CSV schema (reference main.py:643-665)
    for m in EXPECTED_METRICS:
        for suffix in ("_mean", "_lower", "_upper", "_std"):
            assert f"{m}{suffix}" in df.columns, f"{m}{suffix} missing"
    for col in ("Time", "QPS", "Encoding_Time", "Img_per_sec"):
        assert col in df.columns

    row = df.iloc[0]
    for m in EXPECTED_METRICS:
        assert 0.0 <= row[f"{m}_mean"] <= 100.0
        assert row[f"{m}_lower"] <= row[f"{m}_mean"] + 1e-6
        assert row[f"{m}_mean"] <= row[f"{m}_upper"] + 1e-6
    # random-weight model on 48 images: R@10 must beat R@1, recall monotone in k
    assert row["T2I_R@10_mean"] >= row["T2I_R@1_mean"]
    assert row["QPS"] > 0

    fa = json.loads(row["_failure_analysis"])
    assert "overall_accuracy" in fa
    assert "accuracy_by_category" in fa


def test_cli_colpali_end_to_end(tmp_path):
    """Multi-vector late-interaction path through the full pipeline."""
    out = tmp_path / "colpali.csv"
    rc = main(
        [
            "--dataset", "synthetic",
            "--debug-models",
            "--models", "ColPali-v1.3",
            "--sample-size", "24",
            "--bootstrap-iterations", "8",
            "--output", str(out),
        ]
    )
    assert rc == 0
    df = pd.read_csv(out)
    assert df.iloc[0]["Model"] == "ColPali-v1.3"
    row = df.iloc[0]
    for m in EXPECTED_METRICS:
        assert 0.0 <= row[f"{m}_mean"] <= 100.0


def test_cli_mesh_vs_single_device_identical(tmp_path, monkeypatch):
    """The full CLI path (preprocess, encode, dense scoring, bootstrap) on
    the 8-device mesh must produce metrics identical to a 1-device run —
    every benchmark stage is provably sharding-invariant (SURVEY.md §7.1(5))."""
    import jax

    import multimodal_embedding_tpu.cli.main as cli_main
    from multimodal_embedding_tpu.parallel.mesh import get_mesh

    args = [
        "--dataset", "synthetic", "--debug-models",
        "--models", "OpenAI-CLIP-L,ColPali-v1.3",
        "--sample-size", "24", "--bootstrap-iterations", "6",
    ]
    out_mesh = tmp_path / "mesh8.csv"
    assert main(args + ["--output", str(out_mesh)]) == 0

    single = get_mesh(n_data=1, devices=jax.devices()[:1])
    monkeypatch.setattr(cli_main, "get_mesh", lambda **kw: single)
    out_one = tmp_path / "mesh1.csv"
    assert main(args + ["--output", str(out_one)]) == 0

    a, b = pd.read_csv(out_mesh), pd.read_csv(out_one)
    for i in range(len(a)):
        for col in a.columns:
            if col.endswith(("_mean", "_lower", "_upper", "_std")):
                assert a.iloc[i][col] == b.iloc[i][col], (a.iloc[i]["Model"], col)
        assert a.iloc[i]["_failure_analysis"] == b.iloc[i]["_failure_analysis"]


def test_cli_tensor_parallel_runs_and_matches(tmp_path):
    """--tensor-parallel 2 builds a (4, 2) mesh and Megatron-shards params.

    TP changes float reduction orders (row-split contractions psum across
    chips), so exact equality is proven at the embedding level in
    tests/test_tp.py; here the full CLI must run and land within noise of the
    data-parallel metrics."""
    args = [
        "--dataset", "synthetic", "--debug-models", "--models", "OpenAI-CLIP-L",
        "--sample-size", "24", "--bootstrap-iterations", "6",
    ]
    out_dp = tmp_path / "dp.csv"
    assert main(args + ["--output", str(out_dp)]) == 0
    out_tp = tmp_path / "tp.csv"
    assert main(args + ["--tensor-parallel", "2", "--output", str(out_tp)]) == 0

    a, b = pd.read_csv(out_dp), pd.read_csv(out_tp)
    for m in EXPECTED_METRICS:
        assert abs(a.iloc[0][f"{m}_mean"] - b.iloc[0][f"{m}_mean"]) <= 3.0, m


def test_cli_determinism(tmp_path):
    """Two identical runs must produce bit-identical metrics (explicit PRNG
    threading replaces the reference's global seeding, SURVEY.md §5.2)."""
    outs = []
    for name in ("d1.csv", "d2.csv"):
        out = tmp_path / name
        rc = main(
            [
                "--dataset", "synthetic", "--debug-models", "--models", "SigLIP-400M",
                "--sample-size", "24", "--bootstrap-iterations", "6",
                "--output", str(out),
            ]
        )
        assert rc == 0
        outs.append(pd.read_csv(out))
    a, b = outs
    for col in a.columns:
        if col.endswith(("_mean", "_lower", "_upper", "_std")):
            assert a.iloc[0][col] == b.iloc[0][col], col
    assert a.iloc[0]["_failure_analysis"] == b.iloc[0]["_failure_analysis"]


def test_cli_staging_modes_identical_and_hybrid_stays_cached(tmp_path, monkeypatch):
    """The three staging modes (hybrid overlap [default], pure streaming,
    serial) must produce bit-identical metrics, and the hybrid default must
    never time the streaming encode path — it joins staging before the timed
    region and measures the cached path (PERF.md round-5 overlap A/B: the
    streaming path distorted model 1's published QPS ~2x)."""
    from multimodal_embedding_tpu.models.encode import EncodingEngine

    calls: list[str] = []
    orig = EncodingEngine.encode_images_streaming

    def spy(self, stager):
        calls.append("streaming")
        return orig(self, stager)

    monkeypatch.setattr(EncodingEngine, "encode_images_streaming", spy)

    def run(extra, name):
        out = tmp_path / f"{name}.csv"
        rc = main(
            [
                "--dataset", "synthetic", "--debug-models",
                "--models", "OpenAI-CLIP-L", "--sample-size", "32",
                "--bootstrap-iterations", "8", "--batch-size", "16",
                "--output", str(out),
            ] + extra
        )
        assert rc == 0
        return pd.read_csv(out)

    hybrid = run(["--overlap-staging"], "hybrid")
    assert calls == [], "hybrid default must not run the streaming encode"
    stream = run(["--overlap-staging", "--streaming-encode"], "stream")
    assert calls == ["streaming"], "--streaming-encode must stream model 1"
    off = run(["--no-overlap-staging"], "off")

    for col in hybrid.columns:
        if col.endswith(("_mean", "_lower", "_upper", "_std")):
            assert hybrid.iloc[0][col] == stream.iloc[0][col] == off.iloc[0][col], col


def test_cli_all_models_failed_exits_nonzero(tmp_path, monkeypatch):
    """Per-model failures skip-and-continue (reference behavior), but a run
    where every model failed must not exit 0 with an empty CSV — a driver
    would record it as a completed benchmark (seen with a transient device
    OOM that failed all loads)."""
    import multimodal_embedding_tpu.cli.main as cli_main

    def boom(info, seed=0):
        raise RuntimeError("RESOURCE_EXHAUSTED (simulated)")

    monkeypatch.setattr(cli_main, "load_debug_model", boom)
    monkeypatch.setattr(cli_main, "LOAD_RETRY_BACKOFF_S", 0.0)
    rc = main(
        [
            "--dataset", "synthetic", "--debug-models", "--models", "SigLIP-400M",
            "--sample-size", "24", "--bootstrap-iterations", "6",
            "--output", str(tmp_path / "empty.csv"),
        ]
    )
    assert rc == 1


def test_cli_model_load_retries_transient_oom(tmp_path, monkeypatch):
    """A RESOURCE_EXHAUSTED at model load is retried after an idle backoff
    (server-side HBM reclaim lags a just-exited client and self-drains);
    a non-OOM load error is NOT retried."""
    import multimodal_embedding_tpu.cli.main as cli_main

    real = cli_main.load_debug_model
    calls = {"n": 0}

    def flaky(info, seed=0):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted).")
        return real(info, seed=seed)

    monkeypatch.setattr(cli_main, "load_debug_model", flaky)
    monkeypatch.setattr(cli_main, "LOAD_RETRY_BACKOFF_S", 0.0)
    out = tmp_path / "retry.csv"
    rc = main(
        [
            "--dataset", "synthetic", "--debug-models", "--models", "SigLIP-400M",
            "--sample-size", "24", "--bootstrap-iterations", "6",
            "--output", str(out),
        ]
    )
    assert rc == 0 and calls["n"] == 2
    assert len(pd.read_csv(out)) == 1

    calls["n"] = 0

    def hard_fail(info, seed=0):
        calls["n"] += 1
        raise ValueError("bad checkpoint (not transient)")

    monkeypatch.setattr(cli_main, "load_debug_model", hard_fail)
    rc = main(
        [
            "--dataset", "synthetic", "--debug-models", "--models", "SigLIP-400M",
            "--sample-size", "24", "--bootstrap-iterations", "6",
            "--output", str(tmp_path / "hard.csv"),
        ]
    )
    assert rc == 1 and calls["n"] == 1
