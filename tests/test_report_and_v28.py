"""Report generator, analyzer CLI, Winoground, and v28 multi-seed runner."""

import numpy as np
import pandas as pd
import pytest

from multimodal_embedding_tpu.cli.analyze import main as analyze_main
from multimodal_embedding_tpu.cli.main import main as bench_main
from multimodal_embedding_tpu.cli.multi_seed import main as v28_main


@pytest.fixture(scope="module")
def results_csv(tmp_path_factory):
    out = tmp_path_factory.mktemp("res") / "results.csv"
    rc = bench_main(
        [
            "--dataset", "synthetic", "--debug-models",
            "--models", "OpenAI-CLIP-L,SigLIP-400M",
            "--sample-size", "32", "--bootstrap-iterations", "10",
            "--output", str(out),
        ]
    )
    assert rc == 0
    return out


def test_analyzer_report(results_csv, tmp_path):
    report = tmp_path / "report.md"
    rc = analyze_main(["--input", str(results_csv), "--output", str(report)])
    assert rc == 0
    text = report.read_text()
    assert "## Text-to-Image Retrieval" in text
    assert "Statistical Significance Testing" in text
    assert "permutation test on raw bootstrap samples" in text  # sidecar used
    assert "Efficiency Score" in text
    assert "Per-Category Performance" in text
    # both models ranked
    assert "OpenAI-CLIP-L" in text and "SigLIP-400M" in text


def test_analyzer_plots(results_csv, tmp_path):
    """--plots emits the Pareto + per-category PNGs the reference docstring
    promises but never implements (analyze_statistical_results.py:12)."""
    report = tmp_path / "report.md"
    rc = analyze_main(["--input", str(results_csv), "--output", str(report), "--plots"])
    assert rc == 0
    pareto = report.with_suffix(".pareto.png")
    heat = report.with_suffix(".categories.png")
    assert pareto.exists() and pareto.stat().st_size > 1000
    assert heat.exists() and heat.stat().st_size > 1000


def test_plots_tolerate_missing_failure_column(tmp_path):
    from multimodal_embedding_tpu.analysis.plots import emit_plots

    df = pd.DataFrame(
        [
            {"Model": "A", "T2I_R@1_mean": 40.0, "QPS": 100.0},
            {"Model": "B", "T2I_R@1_mean": 50.0, "QPS": 60.0},
            {"Model": "C", "T2I_R@1_mean": 45.0, "QPS": 30.0},  # dominated
        ]
    )
    paths = emit_plots(df, tmp_path / "r.md")
    assert len(paths) == 1  # heatmap skipped without _failure_analysis
    assert paths[0].exists()


def test_analyzer_without_sidecar(results_csv, tmp_path):
    """No sidecar -> reference CI-overlap approximation path."""
    csv2 = tmp_path / "no_sidecar.csv"
    csv2.write_text(results_csv.read_text())
    report = tmp_path / "report2.md"
    rc = analyze_main(["--input", str(csv2), "--output", str(report)])
    assert rc == 0
    assert "CI-overlap approximation" in report.read_text()


def test_v28_multi_seed_runner(tmp_path):
    out = tmp_path / "v28.csv"
    rc = v28_main(
        [
            "--dataset", "synthetic", "--debug-models",
            "--models", "OpenAI-CLIP-L",
            "--sample-size", "24", "--runs", "2",
            "--winoground-samples", "12",
            "--mrr",
            "--output", str(out),
        ]
    )
    assert rc == 0
    df = pd.read_csv(out)
    row = df.iloc[0]
    assert row["Model"] == "OpenAI-CLIP-L"
    # v28 CSV schema: Wino singles + "mean ± std" strings
    for col in ["Wino Text", "Wino Image", "Wino Group"]:
        assert col in df.columns
    for col in ["T2I_R@1", "I2T_R@10", "QPS", "Img/s", "T2I_MRR"]:
        assert "±" in str(row[col]), col


def test_v28_encode_once_matches_per_run_encode(tmp_path):
    """The default encode-once/permute-many mode must reproduce the
    reference-style per-seed re-encode exactly: tower ops are per-sample
    independent, so indexing a pool encode equals re-encoding the subset
    (COMPAT.md #13). Timing columns are excluded (they measure different
    amounts of work by design)."""
    args = [
        "--dataset", "synthetic", "--debug-models",
        "--models", "OpenAI-CLIP-L,ColPali-v1.3",
        "--sample-size", "16", "--runs", "2",
        "--skip-winoground", "--mrr",
    ]
    out_once = tmp_path / "once.csv"
    out_rerun = tmp_path / "rerun.csv"
    assert v28_main(args + ["--output", str(out_once)]) == 0
    assert v28_main(args + ["--per-run-encode", "--output", str(out_rerun)]) == 0
    a, b = pd.read_csv(out_once), pd.read_csv(out_rerun)
    timing = {"Time", "QPS", "Img/s"}
    assert list(a.columns) == list(b.columns)
    for col in a.columns:
        if col in timing:
            continue
        assert list(a[col]) == list(b[col]), col


def test_winoground_predicates():
    """Hand-built score matrix: model prefers correct pairs for example 0
    only."""
    from multimodal_embedding_tpu.analysis.winoground import run_winoground

    class FakeEngine:
        class model:
            multi_vector = False

        # batching order: all image_0s, then all image_1s (same for captions)
        def encode_images(self, images):
            import jax.numpy as jnp

            class R:
                embeddings = jnp.asarray(np.array([[1.0, 0.0], [0.6, 0.8],
                                                   [0.0, 1.0], [0.8, 0.6]]))
            return R()

        def encode_texts(self, texts):
            import jax.numpy as jnp

            class R:
                embeddings = jnp.asarray(np.array([[1.0, 0.0], [0.8, 0.6],
                                                   [0.0, 1.0], [0.6, 0.8]]))
            return R()

    records = [
        {"image_0": None, "image_1": None, "caption_0": "a", "caption_1": "b"},
        {"image_0": None, "image_1": None, "caption_0": "c", "caption_1": "d"},
    ]
    out = run_winoground(FakeEngine(), records)
    # example 0 (identity pairing): all predicates hold; example 1: c0.i0 =
    # 0.96 < c0.i1 = 1.0 -> text fails, and c1.i0 = 1.0 > c0.i0 -> image fails
    assert out["Wino Text"] == 50.0
    assert out["Wino Image"] == 50.0
    assert out["Wino Group"] == 50.0


def test_score_cache_resume(tmp_path):
    """Second run with --score-cache-dir must skip encoding and reproduce the
    same aggregated metrics."""
    out1 = tmp_path / "r1.csv"
    out2 = tmp_path / "r2.csv"
    cache = tmp_path / "scores"
    common = [
        "--dataset", "synthetic", "--debug-models", "--models", "OpenAI-CLIP-L",
        "--sample-size", "24", "--bootstrap-iterations", "6",
        "--score-cache-dir", str(cache),
    ]
    assert bench_main(common + ["--output", str(out1)]) == 0
    assert len(list(cache.glob("scores_*.npz"))) == 1
    assert bench_main(common + ["--output", str(out2)]) == 0
    df1, df2 = pd.read_csv(out1), pd.read_csv(out2)
    for col in df1.columns:
        if col.endswith("_mean"):
            assert abs(df1.iloc[0][col] - df2.iloc[0][col]) < 1e-6, col


def test_probe_cli_debug_models():
    from multimodal_embedding_tpu.cli.probe import main as probe_main

    rc = probe_main(["--models", "OpenAI-CLIP-L,ColPali-v1.3", "--weights", "debug"])
    assert rc == 0


def test_merge_results_cli(tmp_path):
    from multimodal_embedding_tpu.cli.merge_results import main as merge_main

    a = tmp_path / "a.csv"
    b = tmp_path / "b.csv"
    out = tmp_path / "merged.csv"
    pd.DataFrame([{"Model": "A", "T2I_R@1_mean": 1.0}, {"Model": "B", "T2I_R@1_mean": 2.0}]).to_csv(a, index=False)
    pd.DataFrame([{"Model": "B", "T2I_R@1_mean": 9.0}, {"Model": "C", "T2I_R@1_mean": 3.0}]).to_csv(b, index=False)
    assert merge_main([str(a), str(b), "--output", str(out)]) == 0
    df = pd.read_csv(out)
    assert list(df["Model"]) == ["A", "B", "C"]
    assert float(df[df["Model"] == "B"]["T2I_R@1_mean"].iloc[0]) == 9.0  # later wins


def test_merge_results_mixes_reference_schema(tmp_path):
    """Merging a reference-schema CSV (no Weights column, COMPAT.md #14) with
    ours must keep the union schema and mark provenance-less rows 'unknown'."""
    from multimodal_embedding_tpu.cli.merge_results import main as merge_main

    ours = tmp_path / "ours.csv"
    ref = tmp_path / "ref.csv"
    out = tmp_path / "merged.csv"
    pd.DataFrame(
        [{"Model": "A", "T2I_R@1_mean": 1.0, "Weights": "arch-random"}]
    ).to_csv(ours, index=False)
    pd.DataFrame([{"Model": "B", "T2I_R@1_mean": 2.0}]).to_csv(ref, index=False)
    assert merge_main([str(ours), str(ref), "--output", str(out)]) == 0
    df = pd.read_csv(out)
    assert list(df["Weights"]) == ["arch-random", "unknown"]

    # reference-only inputs: no Weights column appears at all
    assert merge_main([str(ref), "--output", str(out)]) == 0
    assert "Weights" not in pd.read_csv(out).columns


def test_cli_handles_model_load_failure(tmp_path):
    """A model whose loader raises is logged and skipped; the loop continues
    (reference main.py:822-824) — but a run where NO model succeeded exits
    nonzero instead of reporting an empty benchmark as complete."""
    import os

    out = tmp_path / "r.csv"
    # real loader requires network -> load fails; with every model failed the
    # run must exit 1 and write no rows.
    # HF_HUB_OFFLINE makes the failure immediate instead of a retry timeout.
    os.environ["HF_HUB_OFFLINE"] = "1"
    rc = bench_main(
        [
            "--dataset", "synthetic", "--models", "OpenAI-CLIP-L",
            "--sample-size", "8", "--bootstrap-iterations", "2",
            "--output", str(out),
        ]
    )
    os.environ.pop("HF_HUB_OFFLINE", None)
    assert rc == 1
    assert not out.exists() or len(pd.read_csv(out)) == 0


def test_encode_cli(tmp_path):
    from multimodal_embedding_tpu.cli.encode_cli import main as encode_main

    out = tmp_path / "emb.npz"
    rc = encode_main(
        ["--model", "SigLIP-400M", "--dataset", "synthetic", "--sample-size", "12",
         "--debug-models", "--output", str(out)]
    )
    assert rc == 0
    data = np.load(out)
    assert data["image_embeddings"].shape[0] == 12
    assert data["text_embeddings"].shape[0] == 60
    assert data["caption_image_index"].shape == (60,)
    norms = np.linalg.norm(data["image_embeddings"], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_index_search_roundtrip(tmp_path):
    """encode -> index -> search: a caption's own image ranks by construction
    when queries ARE the stored embeddings."""
    from multimodal_embedding_tpu.cli.encode_cli import main as encode_main
    from multimodal_embedding_tpu.retrieval.search import Index

    import jax.numpy as jnp

    out = tmp_path / "emb.npz"
    assert encode_main(
        ["--model", "OpenAI-CLIP-L", "--dataset", "synthetic", "--sample-size", "10",
         "--debug-models", "--output", str(out)]
    ) == 0
    idx = Index.from_npz(str(out))
    data = np.load(out)
    # query with the image embeddings themselves: top-1 must be identity
    ids, scores = idx.search(jnp.asarray(data["image_embeddings"]), k=3)
    np.testing.assert_array_equal(ids[:, 0], data["imgids"])
    assert np.all(scores[:, 0] >= scores[:, 1] - 1e-6)


def test_search_cli(tmp_path, capsys):
    from multimodal_embedding_tpu.cli.encode_cli import main as encode_main
    from multimodal_embedding_tpu.cli.search import main as search_main

    out = tmp_path / "emb.npz"
    encode_main(["--model", "SigLIP-400M", "--dataset", "synthetic", "--sample-size", "8",
                 "--debug-models", "--output", str(out)])
    rc = search_main(["--index", str(out), "--model", "SigLIP-400M", "--debug-models",
                      "--query", "a red dog", "--k", "3"])
    assert rc == 0
    captured = capsys.readouterr().out
    assert "query: a red dog" in captured
    assert len([l for l in captured.splitlines() if l.startswith("  ")]) == 3


def test_ci_overlap_p_value_matches_reference_formula():
    """The fallback significance approximation reproduces the reference's
    norm_cdf/effect-size computation (analyze_statistical_results.py:47-102)."""
    import math

    from multimodal_embedding_tpu.analysis.report import ci_overlap_p_value

    row_i = pd.Series({"m_mean": 50.0, "m_lower": 48.0, "m_upper": 52.0, "m_std": 1.0})
    row_j = pd.Series({"m_mean": 51.0, "m_lower": 49.0, "m_upper": 53.0, "m_std": 1.0})
    # overlapping CIs -> effect-size path: |50-51| / sqrt((1+1)/2) = 1.0
    expected = 2 * (1 - 0.5 * (1 + math.erf(1.0 / math.sqrt(2))))
    assert abs(ci_overlap_p_value(row_i, row_j, "m") - expected) < 1e-9

    # disjoint CIs -> p = 0.01
    row_k = pd.Series({"m_mean": 60.0, "m_lower": 58.0, "m_upper": 62.0, "m_std": 1.0})
    assert ci_overlap_p_value(row_i, row_k, "m") == 0.01
