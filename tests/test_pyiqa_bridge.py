"""pyiqa escape hatch (reference eval_metrics.py:100-159): unknown ``-qm``
names resolve through a host-callback bridge when ``import pyiqa`` works.
The real pyiqa is absent in this image, so a stubbed fake module stands in;
the bridge only touches ``list_models`` / ``create_metric`` /
``metric_mode`` / tensor ``__call__``, which the stub implements with
torch ops so numeric expectations are exact."""

import sys
import types

import numpy as np
import pytest

from evreal_tpu.metrics import registry


class _FakeMetric:
    """metric(t) = mean over (C,H,W) per batch item; FR variant returns
    mean absolute difference. Mirrors pyiqa's (N,3,H,W)->(N,) contract."""

    def __init__(self, mode):
        self.metric_mode = mode

    def __call__(self, img, ref=None):
        assert img.ndim == 4 and img.shape[1] == 3, img.shape
        if self.metric_mode == "NR":
            return img.mean(dim=(1, 2, 3))
        return (img - ref).abs().mean(dim=(1, 2, 3))


@pytest.fixture
def fake_pyiqa(monkeypatch):
    mod = types.ModuleType("pyiqa")
    mod.list_models = lambda: ["fakenr", "fakefr"]
    mod.create_metric = lambda name: _FakeMetric(
        "NR" if name == "fakenr" else "FR")
    monkeypatch.setitem(sys.modules, "pyiqa", mod)
    # created specs get registered; drop them after each test
    yield mod
    registry._REGISTRY.pop("fakenr", None)
    registry._REGISTRY.pop("fakefr", None)


def test_unknown_name_routes_through_bridge(fake_pyiqa, capsys):
    specs = registry.resolve(["mse", "fakenr", "fakefr", "nosuchmetric"])
    names = [s.name for s in specs]
    assert names == ["mse", "fakenr", "fakefr"]
    assert specs[1].no_ref is True
    assert specs[2].no_ref is False
    out = capsys.readouterr().out
    assert "Unknown metric nosuchmetric" in out
    assert "fakenr" not in out  # no warn-skip for a bridged name


def test_bridge_scores_match_host_oracle(fake_pyiqa):
    import jax
    import jax.numpy as jnp

    specs = registry.resolve(["fakenr", "fakefr"])
    nr, fr = specs[0], specs[1]
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (6, 16, 24)).astype(np.float32)
    refs = rng.uniform(0, 1, (6, 16, 24)).astype(np.float32)

    # chunk-level vmap inside jit — exactly how the harness runs metrics
    got_nr = jax.jit(jax.vmap(nr.fn))(jnp.asarray(imgs))
    got_fr = jax.jit(jax.vmap(fr.fn))(jnp.asarray(imgs), jnp.asarray(refs))
    np.testing.assert_allclose(np.asarray(got_nr), imgs.mean((1, 2)),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_fr),
                               np.abs(imgs - refs).mean((1, 2)), rtol=1e-6)

    # unbatched (trace-probe) path returns a scalar
    one = jax.jit(nr.fn)(jnp.asarray(imgs[0]))
    np.testing.assert_allclose(float(one), imgs[0].mean(), rtol=1e-6)

    # the batched group runner double-vmaps metric fns over (N, T)
    # (batched.py metric_scores) — the host callback then sees a 4-d array
    nimgs = rng.uniform(0, 1, (3, 4, 16, 24)).astype(np.float32)
    nrefs = rng.uniform(0, 1, (3, 4, 16, 24)).astype(np.float32)
    got2 = jax.jit(jax.vmap(jax.vmap(nr.fn)))(jnp.asarray(nimgs))
    np.testing.assert_allclose(np.asarray(got2), nimgs.mean((2, 3)),
                               rtol=1e-6)
    got2f = jax.jit(jax.vmap(jax.vmap(fr.fn)))(jnp.asarray(nimgs),
                                               jnp.asarray(nrefs))
    np.testing.assert_allclose(np.asarray(got2f),
                               np.abs(nimgs - nrefs).mean((2, 3)),
                               rtol=1e-6)


def test_bridged_metric_through_full_harness(fake_pyiqa, tmp_path,
                                             monkeypatch, seq_dir):
    """-qm <pyiqa name> end-to-end: scores land in <name>.txt like any
    built-in, computed by the host callback per chunk."""
    from evreal_tpu.harness.runner import eval_method_on_sequence
    from evreal_tpu.data import Sequence

    from .test_end_to_end import FakeBundle

    monkeypatch.chdir(tmp_path)
    seq = Sequence(seq_dir, num_bins=5,
                   voxel_method={"method": "between_frames"})
    sequence = {"name": "seq0", "dataset": seq,
                "start_time_s": 0.1, "end_time_s": 0.8}
    eval_config = {"name": "std", "save_images": False, "histeq": "none",
                   "eval_infer_all": False, "ts_tol_ms": 1.0,
                   "create_video": False,
                   "dataset_kwargs": {
                       "num_bins": 5,
                       "voxel_method": {"method": "between_frames"},
                       "keep_ratio": 1.0}}
    method_config = {"model_name": "FireNet+",
                     "event_tensor_normalization": False,
                     "post_process_norm": "none"}
    num_eval, mean_scores = eval_method_on_sequence(
        "SYN", eval_config, "FireNet+", FakeBundle("FireNet+"),
        method_config, sequence, ["mse", "fakenr"])
    assert num_eval > 0
    out_dir = tmp_path / "outputs" / "std" / "SYN" / "seq0" / "FireNet+"
    rows = [l.split() for l in
            (out_dir / "fakenr.txt").read_text().splitlines()]
    assert len(rows) == num_eval
    # fakenr == mean of the clipped reconstruction: always within [0, 1]
    assert all(0.0 <= float(r[1]) <= 1.0 for r in rows)
    assert abs(mean_scores["fakenr"]
               - np.mean([float(r[1]) for r in rows])) < 1e-6


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    import sys as _sys
    _sys.path.insert(0, "/root/repo/tools")
    from make_synthetic_sequence import make_sequence

    d = tmp_path_factory.mktemp("data") / "seq0"
    make_sequence(str(d), height=48, width=64, duration_s=1.0, fps=20,
                  events_per_frame=1200, seed=11)
    return str(d)


def test_without_pyiqa_unknown_stays_unknown(capsys):
    sys.modules.pop("pyiqa", None)  # the real package is absent here
    specs = registry.resolve(["definitelynotametric"])
    assert specs == []
    assert "Unknown metric definitelynotametric" in capsys.readouterr().out


def test_create_metric_failure_is_contained(monkeypatch, capsys):
    """A name pyiqa knows but cannot construct (typical: weight download
    off-network) warn-skips instead of killing the dataset eval."""
    import types

    mod = types.ModuleType("pyiqa")
    mod.list_models = lambda: ["deadmetric"]

    def explode(name):
        raise OSError("connection refused downloading weights")

    mod.create_metric = explode
    monkeypatch.setitem(sys.modules, "pyiqa", mod)
    specs = registry.resolve(["mse", "deadmetric"])
    assert [s.name for s in specs] == ["mse"]
    out = capsys.readouterr().out
    assert "deadmetric" in out and "skipping" in out
