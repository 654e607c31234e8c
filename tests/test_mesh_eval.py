"""Mesh-sharded batched eval (dp over sequences, 8 virtual CPU devices) must
match the unsharded path exactly."""

import jax
import numpy as np
import pytest

import evreal_tpu.harness.batched as B
from evreal_tpu.harness.batched import eval_method_on_sequence_group

from .test_batched_eval import EVAL_CONFIG, METHOD_CONFIG, _sequences, seq_dirs  # noqa: F401
from .test_end_to_end import FakeBundle


def test_mesh_sharded_batched_eval(seq_dirs, tmp_path, monkeypatch):  # noqa: F811
    from evreal_tpu.parallel.mesh import make_mesh

    bundle = FakeBundle("FireNet+")

    # unsharded reference run
    monkeypatch.setattr(B, "_EVAL_MESH", None)
    d0 = tmp_path / "unsharded"
    d0.mkdir()
    monkeypatch.chdir(d0)
    base = eval_method_on_sequence_group(
        "SYNS", EVAL_CONFIG, "FireNet+", bundle, METHOD_CONFIG,
        _sequences(seq_dirs), ["mse", "ssim"])

    # sharded run over the CPU mesh (2 sequences -> padded to 8 dp rows)
    mesh = make_mesh(8, axes=("dp",), devices=jax.devices("cpu"))
    monkeypatch.setattr(B, "_EVAL_MESH", mesh)
    bundle2 = FakeBundle("FireNet+")
    d1 = tmp_path / "sharded"
    d1.mkdir()
    monkeypatch.chdir(d1)
    sharded = eval_method_on_sequence_group(
        "SYNS", EVAL_CONFIG, "FireNet+", bundle2, METHOD_CONFIG,
        _sequences(seq_dirs), ["mse", "ssim"])

    assert len(base) == len(sharded) == 2
    for i, ((n0, s0), (n1, s1)) in enumerate(zip(base, sharded)):
        assert n0 == n1
        for k in s0:
            assert abs(s0[k] - s1[k]) < 1e-5, (i, k)
        a = (d0 / "outputs/std/SYNS" / f"seq{i}" / "FireNet+" /
             "mse.txt").read_text()
        b = (d1 / "outputs/std/SYNS" / f"seq{i}" / "FireNet+" /
             "mse.txt").read_text()
        assert a == b, i
