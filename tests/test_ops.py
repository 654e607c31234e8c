import numpy as np
import pytest

from evreal_tpu.ops.pad import CropParams
from evreal_tpu.ops.normalize import normalize_event_tensor, post_process_normalization

from .oracle import ref_module


@pytest.mark.parametrize("h,w,enc", [(180, 240, 3), (260, 346, 3), (180, 240, 0),
                                     (125, 133, 4), (256, 256, 3)])
def test_crop_params_matches_reference(h, w, enc):
    import torch

    util = ref_module("utils.util")
    ref = util.CropParameters(w, h, enc)
    ours = CropParams(w, h, enc)
    assert (ours.padding_top, ours.padding_bottom, ours.padding_left,
            ours.padding_right) == (ref.padding_top, ref.padding_bottom,
                                    ref.padding_left, ref.padding_right)
    x = np.random.default_rng(0).normal(size=(1, 5, h, w)).astype(np.float32)
    ref_padded = ref.pad(torch.tensor(x)).numpy()
    ours_padded = np.asarray(ours.pad(x.transpose(0, 2, 3, 1)))
    np.testing.assert_array_equal(ours_padded.transpose(0, 3, 1, 2), ref_padded)
    ref_crop = ref.crop(torch.tensor(ref_padded)).numpy()
    ours_crop = np.asarray(ours.crop(ours_padded))
    np.testing.assert_array_equal(ours_crop.transpose(0, 3, 1, 2), ref_crop)


def test_normalize_event_tensor_matches_reference():
    import torch

    ev = ref_module("eval") if False else None  # eval.py needs pyiqa; use inline oracle
    rng = np.random.default_rng(1)
    x = rng.normal(size=(5, 16, 24)).astype(np.float32)
    x[x < 0.3] = 0.0

    # Oracle: reference eval.py:398-410 semantics via torch.
    t = torch.tensor(x)
    nonzero = t != 0
    num = nonzero.sum()
    mean = t.sum() / num
    stddev = torch.sqrt((t ** 2).sum() / num - mean ** 2)
    stddev = torch.max(stddev, torch.tensor(1e-6))
    want = (nonzero.float() * (t - mean) / stddev).numpy()

    got = np.asarray(normalize_event_tensor(x))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_normalize_event_tensor_all_zero():
    x = np.zeros((5, 8, 8), np.float32)
    got = np.asarray(normalize_event_tensor(x))
    np.testing.assert_array_equal(got, 0)


@pytest.mark.parametrize("norm", ["none", "robust", "standard", "exprobust"])
def test_post_process_normalization_matches_reference(norm):
    rng = np.random.default_rng(2)
    img = rng.uniform(-0.2, 1.2, size=(64, 80)).astype(np.float32)

    # Oracle: reference eval.py:380-395 + utils/eval_utils.py:15-35 (numpy).
    def np_norm(im, qlo, qhi):
        lo = np.percentile(im.ravel(), qlo)
        hi = np.percentile(im.ravel(), qhi)
        return (im - lo) / (hi - lo)

    if norm == "robust":
        want = np_norm(img, 1, 99)
    elif norm == "standard":
        want = np_norm(img, 0, 100)
    elif norm == "exprobust":
        want = np_norm(np.exp(img), 1, 99)
    else:
        want = img
    got = np.asarray(post_process_normalization(img, norm))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_activation_fn_resolves_torch_style_names():
    """The reference applies any torch function name as final activation
    (getattr(torch, name), unet.py:34); jnp/jax.nn names must resolve and
    unknown names must fail clearly, not KeyError inside a trace."""
    import jax.numpy as jnp
    import pytest

    from evreal_tpu.nn.layers import activation_fn

    assert activation_fn("exp") is jnp.exp
    assert np.isclose(float(activation_fn("softplus")(jnp.float32(0.0))),
                      np.log(2.0))
    assert activation_fn("") is None
    with pytest.raises(ValueError, match="unknown activation"):
        activation_fn("definitely_not_a_function")
    with pytest.raises(ValueError, match="unknown activation"):
        activation_fn("pi")  # resolves to a constant, not a callable


def test_crop_params_fuzz_vs_reference():
    """Random (h, w, num_encoders): pad placement matches CropParameters
    exactly and crop(pad(x)) is the identity."""
    import torch

    from evreal_tpu.ops.pad import CropParams

    from .oracle import ref_module

    util = ref_module("utils.util")
    rng = np.random.default_rng(7)
    for _ in range(12):
        h = int(rng.integers(17, 90))
        w = int(rng.integers(17, 90))
        enc = int(rng.integers(0, 4))
        ours = CropParams(w, h, enc)
        ref = util.CropParameters(w, h, enc)
        x = rng.random((1, h, w, 1)).astype(np.float32)
        xt = torch.tensor(x.transpose(0, 3, 1, 2))
        np.testing.assert_array_equal(
            np.asarray(ours.pad(x)).transpose(0, 3, 1, 2),
            ref.pad(xt).numpy())
        np.testing.assert_array_equal(
            np.asarray(ours.crop(ours.pad(x))), x)


def test_upsample2x_bilinear_matches_torch_and_general_path():
    """The phase-decomposed 2x bilinear upsample (nn/layers.py, non-default
    — see its docstring for the compile-stall finding) must match torch
    F.interpolate(scale_factor=2, mode='bilinear', align_corners=False) —
    the reference UpsampleConvLayer's resize (model/submodules.py:69-97) —
    and the jax.image.resize path the models actually dispatch, including
    edge rows/cols and odd sizes."""
    import torch
    import torch.nn.functional as F
    import jax

    from evreal_tpu.nn.layers import resize_bilinear, upsample2x_bilinear

    rng = np.random.default_rng(3)
    for h, w, c in [(7, 9, 2), (24, 31, 3), (1, 5, 1), (45, 60, 4)]:
        x = rng.normal(size=(2, h, w, c)).astype(np.float32)
        ours = np.asarray(upsample2x_bilinear(x))
        ref = F.interpolate(torch.tensor(x.transpose(0, 3, 1, 2)),
                            scale_factor=2, mode="bilinear",
                            align_corners=False).numpy()
        np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref,
                                   atol=1e-6, rtol=0)
        general = np.asarray(jax.image.resize(
            x, (2, 2 * h, 2 * w, c), method="bilinear", antialias=False))
        np.testing.assert_allclose(ours, general, atol=1e-6, rtol=0)
        # and resize_bilinear dispatches the 2x case to the same values
        np.testing.assert_allclose(
            np.asarray(resize_bilinear(x, 2 * h, 2 * w)), general,
            atol=1e-6, rtol=0)


def test_normalize_event_tensor_equal_values_no_nan():
    """All-equal nonzero entries (constant-polarity sparse window) make
    E[x^2]-mean^2 round a hair negative in f32; sqrt(negative) NaN'd the
    whole voxel (review finding, reproduced — the torch reference NaNs on
    the same input; clamping at 0 is a documented strictly-better
    divergence)."""
    import jax.numpy as jnp

    from evreal_tpu.ops.normalize import normalize_event_tensor

    v = np.zeros((1, 8, 8, 5), np.float32)
    v[0, ::2, ::2, 1] = 0.7  # equal nonzero entries
    out = np.asarray(normalize_event_tensor(jnp.asarray(v)))
    assert np.isfinite(out).all()
    # zero entries stay zero; the equal entries normalize to ~0/std-floor
    assert (out[v == 0] == 0).all()


def test_robust_normalize_validates_pct_knob(monkeypatch):
    """A typo'd EVREAL_PCT must fail loudly, not silently select the
    default path (it would corrupt an A/B conclusion)."""
    import jax.numpy as jnp
    import pytest

    from evreal_tpu.ops.normalize import robust_normalize

    monkeypatch.setenv("EVREAL_PCT", "sorted")
    with pytest.raises(ValueError, match="EVREAL_PCT"):
        robust_normalize(jnp.ones((4, 4)), 1, 99)


def test_ssim_small_image_raises():
    """skimage raises for images smaller than the 11-px window; a silent
    NaN would flow into the dataset means instead."""
    import pytest

    from evreal_tpu.metrics.functional import ssim

    with pytest.raises(ValueError, match="too small"):
        ssim(np.zeros((8, 64), np.float32), np.zeros((8, 64), np.float32))


def test_percentiles_rejects_non_flat_on_every_path():
    import jax.numpy as jnp
    import pytest

    from evreal_tpu.ops.percentile import percentiles

    img = jnp.ones((4, 6))
    for qs in [(0, 100), (1, 99)]:  # min/max shortcut AND bisection path
        with pytest.raises(ValueError, match="flat"):
            percentiles(img, qs)
