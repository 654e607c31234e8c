"""Runtime metric containment and metric-program compile behavior.

The reference contains per-metric exceptions: a failing metric is logged and
reset while the others continue (utils/eval_metrics.py:233-242). Host-callback
metrics (niqe/brisque style) execute nothing under trace-time validation, so
their failures can only surface at score-fetch time — these tests pin down
that such a failure drops only the offending metric, not the sequence, and
that the jitted metric program compiles exactly once per sequence (ragged
final chunks are padded to the compiled chunk_t, not recompiled).
"""

import numpy as np
import pytest

from .test_end_to_end import FakeBundle, seq_dir  # noqa: F401 (fixture)

EVAL_CONFIG = {"name": "std", "save_images": False, "histeq": "none",
               "eval_infer_all": False, "ts_tol_ms": 1.0,
               "create_video": False,
               "dataset_kwargs": {"num_bins": 5,
                                  "voxel_method": {"method": "between_frames"},
                                  "keep_ratio": 1.0}}
METHOD_CONFIG = {"model_name": "FireNet+",
                 "event_tensor_normalization": False,
                 "post_process_norm": "none"}


def _sequence(seq_dir):
    from evreal_tpu.data import Sequence

    seq_obj = Sequence(seq_dir, num_bins=5,
                       voxel_method={"method": "between_frames"})
    return {"name": "seq0", "dataset": seq_obj,
            "start_time_s": 0.0, "end_time_s": 1.0}


def _register_runtime_bomb(fail_always=True):
    """A no-ref metric that traces fine (pure_callback body never runs under
    jax.eval_shape) but raises on every real execution."""
    import jax

    def fn(img):
        def host(im):
            raise ValueError("synthetic runtime metric failure")

        return jax.pure_callback(host, np.zeros((), np.float32), img,
                                 vmap_method="sequential")

    from evreal_tpu.metrics import registry

    registry.register("boom", fn, no_ref=True)


def test_runtime_metric_failure_contained(seq_dir, tmp_path, monkeypatch,
                                          capsys):
    monkeypatch.chdir(tmp_path)
    from evreal_tpu.harness.runner import eval_method_on_sequence
    from evreal_tpu.metrics import registry

    _register_runtime_bomb()
    try:
        bundle = FakeBundle("FireNet+")
        num_eval, mean_scores = eval_method_on_sequence(
            "SYN", EVAL_CONFIG, "FireNet+", bundle, METHOD_CONFIG,
            _sequence(seq_dir), ["mse", "boom"])
    finally:
        registry._REGISTRY.pop("boom", None)

    # the sequence completed and mse survived
    assert num_eval > 0
    assert "mse" in mean_scores and np.isfinite(mean_scores["mse"])
    # no boom scores were recorded: the tracker reports its no-scores
    # sentinel (-1, reference MetricTracker semantics) or omits the key
    assert mean_scores.get("boom", -1) == -1
    out_dir = tmp_path / "outputs" / "std" / "SYN" / "seq0" / "FireNet+"
    mse_rows = (out_dir / "mse.txt").read_text().splitlines()
    assert len(mse_rows) == num_eval
    assert "dropping it" in capsys.readouterr().out


def test_dropped_metric_not_marked_complete(seq_dir, tmp_path, monkeypatch):
    """A runtime-dropped metric must be excluded from done.json's
    completion record so an EVREAL_RESUME rerun re-evaluates the sequence
    instead of reusing a partial mean (advisor finding, round 1)."""
    import json

    monkeypatch.chdir(tmp_path)
    from evreal_tpu.harness.runner import eval_method_on_sequence
    from evreal_tpu.metrics import registry
    from evreal_tpu.metrics.tracker import load_completed

    _register_runtime_bomb()
    try:
        num_eval, _ = eval_method_on_sequence(
            "SYN", EVAL_CONFIG, "FireNet+", FakeBundle("FireNet+"),
            METHOD_CONFIG, _sequence(seq_dir), ["mse", "boom"])
    finally:
        registry._REGISTRY.pop("boom", None)
    assert num_eval > 0

    out_dir = str(tmp_path / "outputs" / "std" / "SYN" / "seq0" / "FireNet+")
    with open(out_dir + "/done.json", encoding="utf-8") as f:
        done = json.load(f)
    assert done["metrics"] == ["mse"]
    assert "boom" not in done["mean_scores"]
    # resume with the same request must re-evaluate (record incomplete)...
    assert load_completed(out_dir, ["mse", "boom"], None) is None
    # ...but a request for the surviving metric alone may reuse it
    assert load_completed(out_dir, ["mse"], None) is not None


def test_params_metric_weights_not_inlined(seq_dir, tmp_path, monkeypatch):
    """A spec with a ``params`` loader must receive its weights through the
    jit boundary as arguments — inlined as closure constants, MANIQA's
    ~400 MB ViT-B/8 blows the axon remote-compile request limit (HTTP 413,
    measured on the real chip)."""
    import jax.numpy as jnp

    from evreal_tpu.metrics import registry

    w = np.full((512, 512), np.float32(3.14159))
    registry.register("wmetric",
                      lambda params, img: img.mean() * params["w"].mean(),
                      no_ref=True, params=lambda: {"w": w})
    try:
        monkeypatch.chdir(tmp_path)
        bundle = FakeBundle("FireNet+")
        seq = _sequence(seq_dir)
        runner = bundle.runner_for(seq["dataset"].sensor_resolution,
                                   METHOD_CONFIG, seq["dataset"].num_bins)
        specs = registry.resolve(["mse", "wmetric"])
        imgs = jnp.zeros((4, 48, 64), jnp.float32)
        scores = runner.metric_scores(specs, imgs, imgs)
        assert np.asarray(scores["wmetric"]).shape == (4,)
        (mfn,) = runner._metric_fns.values()
        aux = {s.name: s.loaded() for s in specs if s.params is not None}
        text = mfn.lower(imgs, imgs, aux).as_text()
        # the 1 MB weight array must appear as a parameter, not a literal
        assert len(text) < 200_000, \
            "metric weights were inlined into the HLO as constants"
    finally:
        registry._REGISTRY.pop("wmetric", None)


def test_metric_program_compiles_once_per_sequence(seq_dir, tmp_path,
                                                   monkeypatch):
    """A ragged final chunk must reuse the full-chunk metric program (refs
    zero-padded, score tails ignored) instead of compiling a second shape."""
    monkeypatch.chdir(tmp_path)
    from evreal_tpu.harness.runner import eval_method_on_sequence

    bundle = FakeBundle("FireNet+")
    seq = _sequence(seq_dir)
    runner = bundle.runner_for(seq["dataset"].sensor_resolution,
                               METHOD_CONFIG, seq["dataset"].num_bins)
    runner.chunk_t = 8  # 19 windows -> chunks of 8, 8, 3 (ragged tail)

    num_eval, mean_scores = eval_method_on_sequence(
        "SYN", EVAL_CONFIG, "FireNet+", bundle, METHOD_CONFIG, seq,
        ["mse", "ssim"])
    assert num_eval > runner.chunk_t  # the ragged tail was actually hit

    mfns = list(runner._metric_fns.values())
    assert len(mfns) == 1
    assert mfns[0]._cache_size() == 1, \
        "ragged tail forced a metric-program recompile"

    # padded-tail scoring must not contaminate real scores: compare against
    # an unchunked rerun
    bundle2 = FakeBundle("FireNet+")
    monkeypatch.chdir(tmp_path / "..")
    (tmp_path / "second").mkdir(exist_ok=True)
    monkeypatch.chdir(tmp_path / "second")
    _, mean2 = eval_method_on_sequence(
        "SYN", EVAL_CONFIG, "FireNet+", bundle2, METHOD_CONFIG,
        _sequence(seq_dir), ["mse", "ssim"])
    assert mean_scores["mse"] == pytest.approx(mean2["mse"], abs=1e-6)
    assert mean_scores["ssim"] == pytest.approx(mean2["ssim"], abs=1e-6)


def test_color_histeq_writes_processed_images(seq_dir, tmp_path,
                                              monkeypatch):
    """Color eval with histeq must hist-equalize merged frames and save
    them under _processed like the reference (eval_metrics.py:260-266); it
    used to leave the _processed tree silently empty."""
    monkeypatch.chdir(tmp_path)
    from evreal_tpu.harness.runner import eval_method_on_sequence

    cfg = dict(EVAL_CONFIG, color=True, histeq="global", save_images=True)
    bundle = FakeBundle("FireNet+")
    eval_method_on_sequence("SYN", cfg, "FireNet+", bundle, METHOD_CONFIG,
                            _sequence(seq_dir), ["mse"])
    proc_dir = (tmp_path / "outputs" / "std" / "SYN" / "seq0" /
                "FireNet+_processed")
    pngs = list(proc_dir.glob("frame_*.png")) if proc_dir.exists() else []
    if not pngs:  # the tracker may use a nested layout; search broadly
        pngs = [p for p in (tmp_path / "outputs").rglob("frame_*.png")
                if "processed" in str(p)]
    assert pngs, "no processed PNGs written for color+histeq"


def test_mid_sequence_drop_excluded_from_mean_table(tmp_path):
    """A metric dropped AFTER recording some chunks must not present its
    partial mean in get_mean_scores() as if complete — the printed table
    and done.json stay consistent (round-2 review finding)."""
    from evreal_tpu.metrics.tracker import EvalMetricsTracker

    t = EvalMetricsTracker(output_dir=str(tmp_path / "o"),
                           quan_eval_metric_names=["mse", "flaky"],
                           has_reference_frames=True)
    for i in range(3):
        t.update(i, None, None, float(i),
                 scores={"mse": 0.5, "flaky": 0.9})
    t.finalize(2, dropped=["flaky"])
    means = t.get_mean_scores()
    assert means["mse"] == pytest.approx(0.5)
    assert means["flaky"] == -1  # partial mean suppressed


def test_no_result_sentinel_not_aggregated():
    """A sequence whose metric recorded no scores (drop/containment)
    reports the -1 sentinel; folding that into the dataset average with
    positive weight would corrupt the printed table (the reference does,
    eval.py:259-266 — deliberate divergence, accumulate_mean_scores)."""
    from evreal_tpu.harness.runner import accumulate_mean_scores
    from evreal_tpu.metrics.tracker import MetricTracker

    mt = MetricTracker()
    accumulate_mean_scores(mt, [(100, {"lpips": 0.3, "mse": 0.1}),
                                (100, {"lpips": -1, "mse": 0.2})])
    assert mt.get_average("lpips") == pytest.approx(0.3)
    assert mt.get_count("lpips") == 100  # only the sequence that scored
    assert mt.get_average("mse") == pytest.approx(0.15)
    assert mt.get_count("mse") == 200
